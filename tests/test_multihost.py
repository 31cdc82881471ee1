"""Sharded execution tests: the data-parallel fragment pass must be
shard-count invariant (byte-identical outputs)."""

import numpy as np
import pytest

from rpvg_tpu import sim
from rpvg_tpu.parallel.multihost import run_pipeline_sharded
from rpvg_tpu.pipeline import PipelineConfig, run_pipeline


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("multihost")
    panel = sim.build_panel(
        num_transcripts=4, num_haplotypes=2, exons_per_transcript=3,
        exon_length=90, variant_sites=1, seed=9,
    )
    records, _ = sim.simulate_read_pairs(
        panel, 300, read_length=60, frag_mean=150, frag_sd=12, seed=13
    )
    aln_path = str(tmp / "aln.json")
    sim.write_alignment_json(records, aln_path)
    return {"panel": panel, "alignments": aln_path, "tmp": tmp}


def make_config(dataset, prefix):
    return PipelineConfig(
        graph=dataset["panel"].graph,
        paths=dataset["panel"].paths_index,
        alignments=dataset["alignments"],
        output_prefix=prefix,
        inference_model="transcripts",
        rng_seed=42,
        score_not_qual=True,
    )


def test_sharded_matches_unsharded(dataset, tmp_path):
    base_prefix = str(tmp_path / "base")
    run_pipeline(make_config(dataset, base_prefix))

    for num_shards in (2, 4):
        prefix = str(tmp_path / f"sharded_{num_shards}")
        run_pipeline_sharded(make_config(dataset, prefix), num_shards)
        with open(base_prefix + ".txt") as a, open(prefix + ".txt") as b:
            assert a.read() == b.read()


def test_sharded_rpa_input(dataset, tmp_path):
    from rpvg_tpu.alignments import parse_multipath_alignment
    from rpvg_tpu.io import rpa

    native = pytest.importorskip("rpvg_tpu.native")
    if not native.native_available():
        pytest.skip("native toolchain unavailable")

    import json

    with open(dataset["alignments"]) as handle:
        records = [json.loads(line) for line in handle if line.strip()]
    alns = [parse_multipath_alignment(r) for r in records]
    pairs = list(zip(alns[0::2], alns[1::2]))
    rpa_path = str(tmp_path / "aln.rpa")
    rpa.write_fragments(
        rpa_path, pairs, is_multipath=True, is_paired=True,
        frag_mean=150.0, frag_sd=12.0, block_size=32,
    )

    base_prefix = str(tmp_path / "rpa_base")
    config = make_config(dataset, base_prefix)
    config.alignments = rpa_path
    run_pipeline(config)

    prefix = str(tmp_path / "rpa_sharded")
    config_sharded = make_config(dataset, prefix)
    config_sharded.alignments = rpa_path
    run_pipeline_sharded(config_sharded, 3)

    with open(base_prefix + ".txt") as a, open(prefix + ".txt") as b:
        assert a.read() == b.read()


def test_native_vs_python_pipeline_identical(dataset, tmp_path):
    """The full pipeline must be byte-identical whether the C++ engine
    (projection + dedup + probability builder) or the Python engine
    runs, including transcript collapse."""
    native = pytest.importorskip("rpvg_tpu.native")
    if not native.native_available():
        pytest.skip("native toolchain unavailable")

    info_path = str(dataset["tmp"] / "info.tsv")
    dataset["panel"].write_info_tsv(info_path)

    for model, info in [("transcripts", None), ("transcripts", info_path),
                        ("haplotypes", None)]:
        tag = f"{model}_{'info' if info else 'plain'}"
        cfg_native = make_config(dataset, str(tmp_path / f"{tag}_native"))
        cfg_native.inference_model = model
        cfg_native.path_info = info
        run_pipeline(cfg_native)

        cfg_python = make_config(dataset, str(tmp_path / f"{tag}_python"))
        cfg_python.inference_model = model
        cfg_python.path_info = info
        cfg_python.native = "off"
        run_pipeline(cfg_python)

        with open(str(tmp_path / f"{tag}_native") + ".txt") as a, open(
            str(tmp_path / f"{tag}_python") + ".txt"
        ) as b:
            assert a.read() == b.read(), f"{tag} diverged"


def _distributed_worker(pid, n, port, graph_path, panel_path, aln_path, prefix):
    import os
    import sys

    import jax

    jax.config.update("jax_platforms", "cpu")
    from rpvg_tpu.parallel.multihost import run_pipeline_distributed
    from rpvg_tpu.pipeline import PipelineConfig

    config = PipelineConfig(
        graph=graph_path,
        paths=panel_path,
        alignments=aln_path,
        output_prefix=prefix,
        inference_model="transcripts",
        num_gibbs_samples=4,
        write_probs=True,
        rng_seed=42,
        score_not_qual=True,
    )
    run_pipeline_distributed(
        config, f"localhost:{port}", num_processes=n, process_id=pid
    )
    os._exit(0)


def test_distributed_matches_single_host(dataset, tmp_path):
    """Two jax.distributed processes (Gloo collectives on CPU) must
    reproduce the single-host outputs byte-for-byte, including Gibbs
    samples."""
    import gzip
    import multiprocessing as mp
    import socket

    # File-based inputs so spawn workers can load them.
    graph_path = str(dataset["tmp"] / "graph.json")
    panel_path = str(dataset["tmp"] / "panel.json")
    dataset["panel"].write_graph_json(graph_path)
    dataset["panel"].write_panel_json(panel_path)

    base_prefix = str(tmp_path / "single")
    config = make_config(dataset, base_prefix)
    config.num_gibbs_samples = 4
    config.write_probs = True
    run_pipeline(config)

    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        port = sock.getsockname()[1]

    prefix = str(tmp_path / "dist")
    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(
            target=_distributed_worker,
            args=(pid, 2, port, graph_path, panel_path, dataset["alignments"], prefix),
        )
        for pid in range(2)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=300)
    assert [p.exitcode for p in procs] == [0, 0]

    with open(base_prefix + ".txt") as a, open(prefix + ".txt") as b:
        assert a.read() == b.read()
    with gzip.open(base_prefix + "_gibbs.txt.gz", "rt") as a, gzip.open(
        prefix + "_gibbs.txt.gz", "rt"
    ) as b:
        assert a.read() == b.read()
    # '-b' probability blocks: formatted per owning process, gathered and
    # written by process 0 — must match the in-process writer exactly.
    with gzip.open(base_prefix + "_probs.txt.gz", "rt") as a, gzip.open(
        prefix + "_probs.txt.gz", "rt"
    ) as b:
        assert a.read() == b.read()


def test_columnar_shard_merge_direct():
    """_merge_columnar_shards: cross-shard duplicates sum their counts
    (rewritten into the blob), first-seen order wins, histograms and
    unaligned counts add."""
    import numpy as np

    from rpvg_tpu.fragments import FragmentLengthDist
    from rpvg_tpu.parallel.multihost import _merge_columnar_shards

    def shard(entries, hist, unaligned):
        # entries: list of (count, anchor, ids, payload_bytes)
        blob = bytearray()
        raw_bounds = [0]
        counts, anchors, id_bounds, all_ids = [], [], [0], []
        for count, anchor, ids, payload in entries:
            blob += int(count).to_bytes(8, "little") + payload
            raw_bounds.append(len(blob))
            counts.append(count)
            anchors.append(anchor)
            all_ids.extend(ids)
            id_bounds.append(len(all_ids))
        return (
            bytes(blob), np.array(counts, np.int64), np.array(anchors, np.int64),
            np.array(id_bounds, np.int64), np.array(all_ids, np.int64),
            np.array(raw_bounds, np.int64), np.array(hist, np.int64), unaligned,
        )

    s0 = shard(
        [(2, 7, [7, 9], b"AAA"), (1, 3, [3], b"BB")], [0, 1, 0], 1,
    )
    s1 = shard(
        [(5, 7, [7, 9], b"AAA"), (4, 11, [], b"CCCC")], [0, 2, 1], 2,
    )
    pre = FragmentLengthDist.from_normal(2, 1, 1)
    merged = _merge_columnar_shards([s0, s1], pre, False)
    cols = merged.columnar
    assert merged.num_entries() == 3
    np.testing.assert_array_equal(cols.counts, [7, 1, 4])
    np.testing.assert_array_equal(cols.anchors, [7, 3, 11])
    # Rewritten blob counts match the merged totals.
    data = np.frombuffer(cols.data, np.uint8)
    for e in range(3):
        start = int(cols.raw_bounds[e])
        embedded = int.from_bytes(bytes(data[start : start + 8]), "little")
        assert embedded == int(cols.counts[e])
    # Payload bytes preserved after the count field.
    assert bytes(data[int(cols.raw_bounds[0]) + 8 : int(cols.raw_bounds[1])]) == b"AAA"
    # Located-id CSR gathered from first-seen shard (incl. an empty run).
    np.testing.assert_array_equal(cols.id_bounds, [0, 2, 3, 3])
    np.testing.assert_array_equal(cols.all_ids, [7, 9, 3])
    np.testing.assert_array_equal(merged.frag_length_counts, [0, 3, 1])
    assert merged.unaligned_count == 3


def test_native_shard_merge_matches_python_spec(monkeypatch):
    """The threaded C++ cross-shard merge (dedup + gather) must be
    byte-identical to the Python keying/gather specification."""
    import numpy as np

    from rpvg_tpu import native as native_mod
    from rpvg_tpu.fragments import FragmentLengthDist
    from rpvg_tpu.parallel import multihost

    if not native_mod.native_available():
        pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(3)
    keys = [
        rng.integers(0, 256, size=rng.integers(12, 40)).astype(np.uint8).tobytes()
        for _ in range(200)
    ]
    payloads = []
    for s in range(3):
        picks = rng.choice(len(keys), size=150, replace=True)
        blob = bytearray()
        bounds, counts, anchors, id_bounds, all_ids = [0], [], [], [0], []
        for k in picks:
            cnt = int(rng.integers(1, 9))
            blob += int(cnt).to_bytes(8, "little") + keys[k]
            bounds.append(len(blob))
            counts.append(cnt)
            anchors.append(int(k))
            all_ids.extend(range(k % 5))
            id_bounds.append(len(all_ids))
        payloads.append(
            (
                bytes(blob), np.asarray(counts, np.int64),
                np.asarray(anchors, np.int64), np.asarray(id_bounds, np.int64),
                np.asarray(all_ids, np.int64), np.asarray(bounds, np.int64),
                np.arange(4, dtype=np.int64) * s, s,
            )
        )
    pre = FragmentLengthDist.from_normal(2, 1, 1)
    nat = multihost._native_shard_merge(payloads, pre, False)
    assert nat is not None

    monkeypatch.setattr(multihost, "_native_shard_merge", lambda *a, **k: None)
    ref = multihost._merge_columnar_shards(payloads, pre, False)

    nc, rc = nat.columnar, ref.columnar
    assert bytes(nc.data) == bytes(rc.data)
    for attr in ("counts", "anchors", "id_bounds", "all_ids", "raw_bounds"):
        np.testing.assert_array_equal(getattr(nc, attr), getattr(rc, attr))
    np.testing.assert_array_equal(nc.histogram, rc.histogram)
    assert nc.unaligned == rc.unaligned


def test_tmpfs_spill_roundtrip_and_legacy_index(tmp_path, monkeypatch):
    """The tmpfs spill must round-trip every payload array exactly, and
    a single-shard adopt of a spilled (memmap-backed) dump must still
    materialise the legacy FragmentIndex — its entries dict keys the
    raw byte slices, which requires bytes, not ndarray views."""
    import os

    import numpy as np
    import pytest

    from rpvg_tpu.parallel.multihost import (
        _load_spilled_payload, _spill_columnar_payload,
    )

    if not os.path.isdir("/dev/shm"):
        pytest.skip("no tmpfs")
    monkeypatch.setenv("RPVG_TPU_SHM_PAYLOAD_MIN", "1")

    rng = np.random.default_rng(2)
    payload = (
        rng.integers(0, 256, 4096).astype(np.uint8).tobytes(),
        rng.integers(1, 5, 7).astype(np.int64),
        rng.integers(0, 9, 7).astype(np.int64),
        np.arange(8, dtype=np.int64),
        rng.integers(0, 9, 30).astype(np.int64),
        np.arange(8, dtype=np.int64) * 13,
        rng.integers(0, 4, 100).astype(np.int64),
        5,
    )
    spilled = _spill_columnar_payload(payload, shard=0)
    assert spilled is not None
    loaded = _load_spilled_payload(spilled)
    assert not os.path.exists(spilled[0])  # unlinked before use
    assert bytes(np.asarray(loaded[0]).tobytes()) == payload[0]
    for got, want in zip(loaded[1:7], payload[1:7]):
        assert np.array_equal(np.asarray(got), want)
    assert loaded[7] == 5

    # Adopt branch contract: memmap-backed data converts to bytes so
    # entry_list() raw slices stay hashable on the legacy path.
    assert isinstance(loaded[0], np.ndarray)
    data = loaded[0]
    assert bytes(data)[:16] == payload[0][:16]
