"""Adversarial fuzz over the binary container loaders.

The snapshot strips the reference's binary fixtures
(/root/reference/.MISSING_LARGE_BLOBS), so the sdsl-layout loaders
cannot be validated against real vg-produced files; this is the
in-snapshot substitute (reference loading surface:
/root/reference/src/main.cpp:616-631).  Property under test, per
format:

* TRUNCATION at any offset must either raise a loud Python exception
  or parse to a result EQUAL to the intact file (a reader is allowed
  to ignore trailing bytes it never needed; it is never allowed to
  silently produce different data).  Framed streams (.gam/.gamp) may
  instead yield an exact PREFIX of the record list — truncating at a
  group boundary legitimately ends the stream early, exactly like the
  reference's protobuf stream.
* BIT FLIPS at random offsets must either raise or parse — flipped
  content bytes legally change the data, but no input may hang, abort
  the interpreter, or escape with a non-Exception error.

Offsets are seeded for reproducibility.
"""

import os

import numpy as np
import pytest

from rpvg_tpu.io.gbwt_file import GBWTFile, GBWTMetadata, build_gbwt, read_ri_header, write_ri_stub
from rpvg_tpu.io import xg_file


def _fuzz_offsets(rng, size, n):
    """n distinct fuzz offsets covering the header, body and tail."""
    if size <= 2:
        return list(range(size))
    picks = set(rng.integers(1, size, size=n).tolist())
    picks.update((1, size // 2, size - 1))
    return sorted(picks)


def _assert_loads_or_raises(load, label):
    """The only acceptable outcomes: a value, or a loud Exception."""
    try:
        return True, load()
    except (NameError, AttributeError):
        # A harness bug (undefined helper, typo'd method) must fail the
        # test, not masquerade as the loader rejecting the input.
        raise
    except Exception:
        return False, None
    # Non-Exception escapes (SystemExit, segfault) abort pytest itself.


# ------------------------------------------------------------------- .gbwt


def _gbwt_fixture(tmp_path):
    rng = np.random.default_rng(7)
    sequences = []
    for _ in range(6):
        length = int(rng.integers(3, 9))
        sequences.append((rng.integers(1, 12, size=length) * 2).tolist())
    meta = GBWTMetadata(
        sample_names=["s0", "s1"], contig_names=["c0"],
        path_names=[(i % 2, 0, i // 2, 0) for i in range(6)],
        haplotype_count=2,
    )
    gbwt = build_gbwt(sequences, bidirectional=False, metadata=meta)
    path = str(tmp_path / "panel.gbwt")
    gbwt.write(path)
    return path


def _gbwt_signature(path):
    g = GBWTFile.read(path)
    return (
        g.sequences, g.size, g.offset, g.alphabet_size, g.bidirectional,
        tuple(
            (comp, tuple(record.edges), tuple(record.runs))
            for comp, record in sorted(g.records.items())
        ),
    )


def test_fuzz_gbwt_truncation(tmp_path):
    path = _gbwt_fixture(tmp_path)
    with open(path, "rb") as handle:
        blob = handle.read()
    intact = _gbwt_signature(path)
    rng = np.random.default_rng(11)
    mutant = str(tmp_path / "trunc.gbwt")
    for cut in _fuzz_offsets(rng, len(blob), 40):
        with open(mutant, "wb") as handle:
            handle.write(blob[:cut])
        ok, value = _assert_loads_or_raises(lambda: _gbwt_signature(mutant), "gbwt")
        if ok:
            assert value == intact, (
                f"truncation at {cut}/{len(blob)} silently parsed DIFFERENT data"
            )


def test_fuzz_gbwt_bit_flips(tmp_path):
    path = _gbwt_fixture(tmp_path)
    with open(path, "rb") as handle:
        blob = bytearray(handle.read())
    rng = np.random.default_rng(13)
    mutant = str(tmp_path / "flip.gbwt")
    for off in _fuzz_offsets(rng, len(blob), 60):
        flipped = bytearray(blob)
        flipped[off] ^= 1 << int(rng.integers(0, 8))
        with open(mutant, "wb") as handle:
            handle.write(flipped)
        _assert_loads_or_raises(lambda: _gbwt_signature(mutant), "gbwt")


# --------------------------------------------------------------------- .xg


def _xg_fixture(tmp_path, vpkg):
    lengths = {i: int(3 + (i * 7) % 40) for i in range(1, 30)}
    path = str(tmp_path / f"graph_{vpkg}.xg")
    xg_file.write_xg(path, lengths, vpkg=vpkg)
    return path, lengths


@pytest.mark.parametrize("vpkg", [True, False])
def test_fuzz_xg_truncation(tmp_path, vpkg):
    path, lengths = _xg_fixture(tmp_path, vpkg)
    with open(path, "rb") as handle:
        blob = handle.read()
    rng = np.random.default_rng(17)
    mutant = str(tmp_path / "trunc.xg")
    for cut in _fuzz_offsets(rng, len(blob), 40):
        with open(mutant, "wb") as handle:
            handle.write(blob[:cut])
        ok, value = _assert_loads_or_raises(
            lambda: xg_file.read_xg_node_lengths(mutant), "xg"
        )
        if ok:
            assert value == lengths, (
                f"truncation at {cut}/{len(blob)} silently parsed DIFFERENT data"
            )


@pytest.mark.parametrize("vpkg", [True, False])
def test_fuzz_xg_bit_flips(tmp_path, vpkg):
    path, _ = _xg_fixture(tmp_path, vpkg)
    with open(path, "rb") as handle:
        blob = bytearray(handle.read())
    rng = np.random.default_rng(19)
    mutant = str(tmp_path / "flip.xg")
    for off in _fuzz_offsets(rng, len(blob), 60):
        flipped = bytearray(blob)
        flipped[off] ^= 1 << int(rng.integers(0, 8))
        with open(mutant, "wb") as handle:
            handle.write(flipped)
        _assert_loads_or_raises(
            lambda: xg_file.read_xg_node_lengths(mutant), "xg"
        )


# ------------------------------------------------------------ .gam / .gamp


def _gam_fixture(tmp_path, is_multipath):
    from rpvg_tpu.io.gam import write_gam_dicts

    suffix = "gamp" if is_multipath else "gam"
    records = []
    for i in range(30):
        mapping = [
            {
                "position": {"node_id": 1 + (i % 5)},
                "edit": [{"from_length": 8, "to_length": 8}],
            }
        ]
        if is_multipath:
            records.append(
                {
                    "sequence": "A" * 8,
                    "mapping_quality": 60,
                    "start": [0],
                    "subpath": [{"path": {"mapping": mapping}, "score": 13}],
                }
            )
        else:
            records.append(
                {
                    "sequence": "A" * 8,
                    "mapping_quality": 60,
                    "path": {"mapping": mapping},
                    "score": 13,
                }
            )
    path = str(tmp_path / f"aln.{suffix}")
    write_gam_dicts(path, records, is_multipath=is_multipath)
    return path


def _gam_records(path, is_multipath):
    from rpvg_tpu.io.gam import stream_gam_alignments

    return [repr(a) for a in stream_gam_alignments(path, is_multipath)]


@pytest.mark.parametrize("is_multipath", [False, True])
def test_fuzz_gam_truncation(tmp_path, is_multipath):
    path = _gam_fixture(tmp_path, is_multipath)
    intact = _gam_records(path, is_multipath)
    with open(path, "rb") as handle:
        blob = handle.read()
    rng = np.random.default_rng(23)
    mutant = str(tmp_path / "trunc.bin")
    for cut in _fuzz_offsets(rng, len(blob), 40):
        with open(mutant, "wb") as handle:
            handle.write(blob[:cut])
        ok, value = _assert_loads_or_raises(
            lambda: _gam_records(mutant, is_multipath), "gam"
        )
        if ok:
            # A clean group-boundary cut ends the stream early: the
            # result must be an exact PREFIX, never reordered/garbled
            # records and never MORE records.
            assert value == intact[: len(value)], (
                f"truncation at {cut}/{len(blob)} yielded non-prefix records"
            )


@pytest.mark.parametrize("is_multipath", [False, True])
def test_fuzz_gam_bit_flips(tmp_path, is_multipath):
    path = _gam_fixture(tmp_path, is_multipath)
    with open(path, "rb") as handle:
        blob = bytearray(handle.read())
    rng = np.random.default_rng(29)
    mutant = str(tmp_path / "flip.bin")
    for off in _fuzz_offsets(rng, len(blob), 60):
        flipped = bytearray(blob)
        flipped[off] ^= 1 << int(rng.integers(0, 8))
        with open(mutant, "wb") as handle:
            handle.write(flipped)
        _assert_loads_or_raises(lambda: _gam_records(mutant, is_multipath), "gam")


# ---------------------------------------------------------------- .rpa


def _rpa_fixture(tmp_path):
    from rpvg_tpu import sim
    from rpvg_tpu.alignments import parse_multipath_alignment
    from rpvg_tpu.io import rpa

    panel = sim.build_panel(
        num_transcripts=3, num_haplotypes=2, exons_per_transcript=2,
        exon_length=50, variant_sites=1, seed=31,
    )
    records, _ = sim.simulate_read_pairs(
        panel, 40, read_length=40, frag_mean=100, frag_sd=10, seed=33
    )
    alns = [parse_multipath_alignment(r) for r in records]
    pairs = list(zip(alns[0::2], alns[1::2]))
    path = str(tmp_path / "aln.rpa")
    rpa.write_fragments(
        path, pairs, is_multipath=True, is_paired=True,
        frag_mean=100.0, frag_sd=10.0,
    )
    return path


def _rpa_blocks(path):
    from rpvg_tpu.io import rpa

    return [bytes(b) for b in rpa.RpaReader(path).blocks()]


def test_fuzz_rpa_truncation_and_flips(tmp_path):
    path = _rpa_fixture(tmp_path)
    intact = _rpa_blocks(path)
    with open(path, "rb") as handle:
        blob = bytearray(handle.read())
    rng = np.random.default_rng(37)
    mutant = str(tmp_path / "fuzz.rpa")
    for cut in _fuzz_offsets(rng, len(blob), 30):
        with open(mutant, "wb") as handle:
            handle.write(bytes(blob[:cut]))
        ok, value = _assert_loads_or_raises(lambda: _rpa_blocks(mutant), "rpa")
        if ok:
            # The container carries no block count, so a cut at an
            # exact block boundary legitimately ends the stream early
            # (like the reference's protobuf stream); a mid-block cut
            # must raise.  Either way the result is an exact prefix.
            assert value == intact[: len(value)], (
                f"truncation at {cut}/{len(blob)} yielded non-prefix blocks"
            )
    for off in _fuzz_offsets(rng, len(blob), 40):
        flipped = bytearray(blob)
        flipped[off] ^= 1 << int(rng.integers(0, 8))
        with open(mutant, "wb") as handle:
            handle.write(bytes(flipped))
        _assert_loads_or_raises(lambda: _rpa_blocks(mutant), "rpa")


# ------------------------------------------------------------------- .ri


def test_fuzz_ri_header(tmp_path):
    path = str(tmp_path / "panel.gbwt.ri")
    write_ri_stub(path, max_length=5)
    with open(path, "rb") as handle:
        blob = bytearray(handle.read())
    intact = read_ri_header(path)
    rng = np.random.default_rng(41)
    mutant = str(tmp_path / "fuzz.ri")
    for cut in _fuzz_offsets(rng, len(blob), 20):
        with open(mutant, "wb") as handle:
            handle.write(bytes(blob[:cut]))
        ok, value = _assert_loads_or_raises(lambda: read_ri_header(mutant), "ri")
        if ok:
            assert value == intact
    for off in _fuzz_offsets(rng, len(blob), 30):
        flipped = bytearray(blob)
        flipped[off] ^= 1 << int(rng.integers(0, 8))
        with open(mutant, "wb") as handle:
            handle.write(bytes(flipped))
        _assert_loads_or_raises(lambda: read_ri_header(mutant), "ri")
