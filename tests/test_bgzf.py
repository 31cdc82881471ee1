"""BGZF output framing: the reference writes its .txt.gz outputs through
HTSlib's BGZF layer (/root/reference/src/threaded_output_writer.cpp:10);
rpvg_tpu must emit real BGZF — independently-deflated <=64KiB blocks
carrying the BC extra subfield, terminated by the 28-byte EOF marker —
while staying readable by every plain gzip reader."""

import gzip
import struct
import zlib

import pytest

from rpvg_tpu.io.bgzf import BGZF_EOF, MAX_BLOCK_INPUT, BgzfTextWriter


def iter_bgzf_blocks(blob: bytes):
    """Parse a BGZF stream block by block, validating the framing the
    way `bgzip -t` / pysam.BGZFile would (SAM spec section 4.1)."""
    pos = 0
    while pos < len(blob):
        assert blob[pos : pos + 4] == b"\x1f\x8b\x08\x04", "gzip+FEXTRA magic"
        xlen = struct.unpack_from("<H", blob, pos + 10)[0]
        # Scan the extra subfields for BC (HTSlib writes exactly one).
        sub_pos, bsize = pos + 12, None
        end = pos + 12 + xlen
        while sub_pos < end:
            si1, si2, slen = struct.unpack_from("<BBH", blob, sub_pos)
            if (si1, si2) == (0x42, 0x43):
                assert slen == 2
                bsize = struct.unpack_from("<H", blob, sub_pos + 4)[0] + 1
            sub_pos += 4 + slen
        assert bsize is not None, "missing BC subfield"
        cdata = blob[pos + 12 + xlen : pos + bsize - 8]
        crc, isize = struct.unpack_from("<II", blob, pos + bsize - 8)
        data = zlib.decompress(cdata, -15)
        assert len(data) == isize
        assert zlib.crc32(data) & 0xFFFFFFFF == crc
        yield data
        pos += bsize
    assert pos == len(blob), "trailing garbage after last block"


def test_bgzf_writer_block_structure(tmp_path):
    path = str(tmp_path / "out.txt.gz")
    writer = BgzfTextWriter(path)
    text = "".join(f"row {i}\t{i * 0.25}\n" for i in range(20000))
    # Feed in uneven chunks to exercise the buffer split.
    for start in range(0, len(text), 37777):
        writer.write(text[start : start + 37777])
    writer.close()

    blob = open(path, "rb").read()
    assert blob.endswith(BGZF_EOF)
    blocks = list(iter_bgzf_blocks(blob))
    assert blocks[-1] == b""  # EOF marker block
    assert all(len(b) <= MAX_BLOCK_INPUT for b in blocks)
    assert len(blocks) >= 2 + 1  # multi-block payload + EOF
    assert b"".join(blocks).decode() == text

    # Plain gzip readers must see the same text (multi-member stream).
    with gzip.open(path, "rt") as handle:
        assert handle.read() == text


def test_bgzf_empty_file_is_just_eof(tmp_path):
    path = str(tmp_path / "empty.txt.gz")
    writer = BgzfTextWriter(path)
    writer.close()
    blob = open(path, "rb").read()
    assert blob == BGZF_EOF
    with gzip.open(path, "rt") as handle:
        assert handle.read() == ""


def test_pipeline_gz_outputs_are_bgzf(tmp_path):
    # End-to-end: the pipeline's _probs/_gibbs gz files carry BGZF framing.
    from tests.helpers import run_tiny_pipeline

    prefix = str(tmp_path / "out")
    run_tiny_pipeline(
        prefix, write_probs=True, num_gibbs_samples=5, seed=7
    )
    for suffix in ("_probs.txt.gz", "_gibbs.txt.gz"):
        blob = open(prefix + suffix, "rb").read()
        assert blob.endswith(BGZF_EOF)
        payload = b"".join(iter_bgzf_blocks(blob))
        with gzip.open(prefix + suffix, "rb") as handle:
            assert handle.read() == payload
