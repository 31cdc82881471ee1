"""sdsl primitives and gbwt::GBWT container round-trips.

The snapshot strips the reference's binary index fixtures
(/root/reference/.MISSING_LARGE_BLOBS) and its gbwt submodule is a
stub, so layout fidelity is validated by self round-trip plus
structural invariants (reference loading surface:
/root/reference/src/main.cpp:616-631, src/paths_index.cpp:77-188).
"""

import io

import numpy as np
import pytest

from rpvg_tpu.graph import Graph
from rpvg_tpu.io import sdsl
from rpvg_tpu.io.gbwt_file import (
    GBWTFile,
    GBWTMetadata,
    GBWTRecord,
    build_gbwt,
)
from rpvg_tpu.pathindex import PathIndex


# ------------------------------------------------------------------- sdsl


def test_int_vector_roundtrip_variable_width():
    buf = io.BytesIO()
    values = [0, 1, 5, 1023, 7]
    sdsl.write_int_vector(buf, values)
    buf.seek(0)
    out = sdsl.read_int_vector(buf)
    assert out.tolist() == values
    assert buf.read() == b""  # stream fully consumed


def test_int_vector_roundtrip_fixed_width():
    buf = io.BytesIO()
    values = list(range(300))
    sdsl.write_int_vector(buf, values, fixed_width=64)
    buf.seek(0)
    assert sdsl.read_int_vector(buf, fixed_width=64).tolist() == values


def test_int_vector_word_padding():
    # 3 values x 5 bits = 15 bits -> one 64-bit word on disk.
    buf = io.BytesIO()
    sdsl.write_int_vector(buf, [1, 2, 3], width=5)
    assert len(buf.getvalue()) == 8 + 1 + 8


def test_bit_vector_roundtrip():
    bits = (np.arange(130) % 3) == 0
    buf = io.BytesIO()
    sdsl.write_bit_vector(buf, bits)
    buf.seek(0)
    out = sdsl.read_bit_vector(buf)
    assert np.array_equal(out, bits)


def test_byte_vector_roundtrip():
    data = bytes(range(23))
    buf = io.BytesIO()
    sdsl.write_byte_vector(buf, data)
    buf.seek(0)
    assert sdsl.read_byte_vector(buf) == data


@pytest.mark.parametrize("universe,positions", [
    (100, [3, 17, 55, 99]),
    (10_000, [0, 1, 2, 9_999]),
    (64, []),
    (1_000_000, list(range(0, 1_000_000, 997))),
])
def test_sd_vector_roundtrip(universe, positions):
    buf = io.BytesIO()
    sdsl.write_sd_vector(buf, positions, universe)
    buf.seek(0)
    out, uni = sdsl.read_sd_vector(buf)
    assert uni == universe
    assert out.tolist() == positions
    assert buf.read() == b""


# ---------------------------------------------------------------- records


def test_record_roundtrip_small_sigma():
    rec = GBWTRecord(edges=[(0, 0), (12, 3), (15, 7)],
                     runs=[(1, 4), (0, 1), (2, 300), (1, 2)])
    out = GBWTRecord.decode(rec.encode())
    assert out.edges == rec.edges
    assert out.runs == rec.runs


def test_record_roundtrip_large_sigma():
    # sigma >= 256 forces the ByteCode run encoding.
    edges = [(i * 3 + 1, i) for i in range(300)]
    runs = [(299, 2), (0, 1), (123, 1000)]
    rec = GBWTRecord(edges=edges, runs=runs)
    out = GBWTRecord.decode(rec.encode())
    assert out.edges == edges
    assert out.runs == runs


def test_record_body_expansion():
    rec = GBWTRecord(edges=[(2, 0), (4, 0)], runs=[(0, 3), (1, 2)])
    assert rec.body().tolist() == [0, 0, 0, 1, 1]


# ----------------------------------------------------------- construction


def _extract_all(gbwt: GBWTFile):
    return [gbwt.extract(i) for i in range(gbwt.sequences)]


def test_build_extract_simple_paths():
    seqs = [[2, 4, 6], [2, 4, 8], [10, 4, 6]]
    gbwt = build_gbwt(seqs)
    assert _extract_all(gbwt) == seqs


def test_build_extract_shared_and_revisited_nodes():
    # Paths revisiting the same node at different depths (cycle-like).
    seqs = [[2, 4, 2, 6], [4, 2, 4], [2, 2, 2]]
    gbwt = build_gbwt(seqs)
    assert _extract_all(gbwt) == seqs


def test_build_extract_bidirectional_pairs():
    fwd = [[2, 4, 6], [8, 4, 10]]
    seqs = []
    for path in fwd:
        seqs.append(path)
        seqs.append([n ^ 1 for n in reversed(path)])
    gbwt = build_gbwt(seqs, bidirectional=True)
    assert gbwt.bidirectional
    assert _extract_all(gbwt) == seqs


def test_file_roundtrip(tmp_path):
    seqs = [[2, 4, 6, 4], [2, 8], [6, 4, 2]]
    meta = GBWTMetadata(
        sample_names=["alpha", "beta", "gamma"],
        path_names=[(0, 0, 0, 0), (1, 0, 0, 0), (2, 0, 0, 0)],
        haplotype_count=3,
    )
    gbwt = build_gbwt(seqs, metadata=meta, tags={"k": "v"})
    path = str(tmp_path / "panel.gbwt")
    gbwt.write(path)
    out = GBWTFile.read(path)
    assert out.sequences == gbwt.sequences
    assert out.size == gbwt.size
    assert out.offset == gbwt.offset
    assert out.alphabet_size == gbwt.alphabet_size
    assert out.tags["k"] == "v"
    assert _extract_all(out) == seqs
    assert out.metadata is not None
    assert out.metadata.sample_names == ["alpha", "beta", "gamma"]
    assert out.metadata.path_name_string(1) == "beta"


def test_metadata_contig_name_formatting():
    meta = GBWTMetadata(
        sample_names=["s1"],
        contig_names=["chr1"],
        path_names=[(0, 0, 2, 7)],
    )
    # Reference formatting sample_contig_phase_count
    # (/root/reference/src/paths_index.cpp:146-170).
    assert meta.path_name_string(0) == "s1_chr1_2_7"
    assert meta.path_name_string(5) == "6"


def test_bad_magic_rejected(tmp_path):
    path = str(tmp_path / "bad.gbwt")
    with open(path, "wb") as out:
        out.write(b"\x00" * 64)
    with pytest.raises(ValueError, match="not a GBWT"):
        GBWTFile.read(path)


# ----------------------------------------------------- PathIndex bridging


def _tiny_graph():
    return Graph({1: 5, 2: 3, 3: 4, 4: 6, 5: 2})


def test_pathindex_gbwt_roundtrip(tmp_path):
    graph = _tiny_graph()
    paths = [[(1, False), (2, False), (4, True)], [(1, False), (3, False)]]
    index = PathIndex.from_node_tuples(
        paths, graph, names=["t1_c_0_1", "t2_c_0_1"], bidirectional=True
    )
    path = str(tmp_path / "panel.gbwt")
    index.to_gbwt_file(path)

    loaded = PathIndex.from_gbwt_file(path, graph)
    assert loaded.is_bidirectional
    assert loaded.number_of_paths() == 2
    assert [loaded.path_name(i) for i in range(2)] == ["t1_c_0_1", "t2_c_0_1"]
    for i in range(2):
        assert np.array_equal(loaded.path_nodes(i), index.path_nodes(i))
        assert loaded.path_length(i) == index.path_length(i)

    # Search behaviour identical over the loaded panel.
    state = loaded.find(2)  # node 1 forward
    state = loaded.extend(state, 4)  # node 2 forward
    assert loaded.locate(state).tolist() == [0]


def test_pipeline_from_gbwt_panel_matches_json_panel(tmp_path):
    """Full pipeline driven by `-p panel.gbwt` is byte-identical to the
    JSON-panel run (the reference's native input path,
    /root/reference/src/main.cpp:616-629)."""
    from rpvg_tpu import sim
    from rpvg_tpu.pipeline import PipelineConfig, run_pipeline

    panel = sim.build_panel(
        num_transcripts=4, num_haplotypes=2, exons_per_transcript=3,
        exon_length=60, variant_sites=1, seed=7,
    )
    records, _ = sim.simulate_read_pairs(
        panel, 200, read_length=50, frag_mean=140, frag_sd=12, seed=13
    )
    graph_path = str(tmp_path / "graph.json")
    json_panel = str(tmp_path / "panel.json")
    gbwt_panel = str(tmp_path / "panel.gbwt")
    aln_path = str(tmp_path / "aln.json")
    panel.write_graph_json(graph_path)
    panel.write_panel_json(json_panel)
    panel.paths_index.to_gbwt_file(gbwt_panel)
    sim.write_alignment_json(records, aln_path)

    outputs = {}
    for label, paths in (("json", json_panel), ("gbwt", gbwt_panel)):
        prefix = str(tmp_path / f"out_{label}")
        run_pipeline(
            PipelineConfig(
                graph=graph_path, paths=paths, alignments=aln_path,
                output_prefix=prefix, inference_model="transcripts",
                threads=2, rng_seed=42, score_not_qual=True,
            )
        )
        with open(prefix + ".txt", "rb") as handle:
            outputs[label] = handle.read()
    assert outputs["gbwt"] == outputs["json"]


def test_pathindex_gbwt_roundtrip_unidirectional(tmp_path):
    graph = _tiny_graph()
    paths = [[(1, False), (2, False)], [(2, False), (4, False)]]
    index = PathIndex.from_node_tuples(
        paths, graph, names=["a", "b"], bidirectional=False
    )
    path = str(tmp_path / "panel_uni.gbwt")
    index.to_gbwt_file(path)
    loaded = PathIndex.from_gbwt_file(path, graph)
    assert not loaded.is_bidirectional
    assert [loaded.path_name(i) for i in range(2)] == ["a", "b"]
    assert np.array_equal(loaded.path_nodes(1), index.path_nodes(1))


def test_ri_sidecar_detected_and_validated(tmp_path, capfd):
    """`<paths>.gbwt.ri` sidecar: auto-detected, header-validated, and
    the reference's 'Loaded graph, GBWT and r-index' phase line printed
    (/root/reference/src/main.cpp:616-649); outputs are unchanged (our
    searchsorted locate already plays the r-index's role).  A corrupt
    magic fails loudly."""
    from rpvg_tpu import sim
    from rpvg_tpu.io.gbwt_file import read_ri_header, write_ri_stub
    from rpvg_tpu.pipeline import PipelineConfig, run_pipeline

    panel = sim.build_panel(
        num_transcripts=4, num_haplotypes=2, exons_per_transcript=3,
        exon_length=60, variant_sites=1, seed=7,
    )
    records, _ = sim.simulate_read_pairs(
        panel, 200, read_length=50, frag_mean=140, frag_sd=12, seed=13
    )
    graph_path = str(tmp_path / "graph.json")
    gbwt_panel = str(tmp_path / "panel.gbwt")
    aln_path = str(tmp_path / "aln.json")
    panel.write_graph_json(graph_path)
    panel.paths_index.to_gbwt_file(gbwt_panel)
    sim.write_alignment_json(records, aln_path)

    def run(label):
        prefix = str(tmp_path / f"out_{label}")
        run_pipeline(
            PipelineConfig(
                graph=graph_path, paths=gbwt_panel, alignments=aln_path,
                output_prefix=prefix, inference_model="transcripts",
                threads=2, rng_seed=42, score_not_qual=True,
            )
        )
        return open(prefix + ".txt", "rb").read()

    without_ri = run("plain")
    assert "Loaded graph and path index" in capfd.readouterr().err

    write_ri_stub(gbwt_panel + ".ri", max_length=5)
    header = read_ri_header(gbwt_panel + ".ri")
    assert header["max_length"] == 5
    with_ri = run("ri")
    assert "Loaded graph, GBWT and r-index" in capfd.readouterr().err
    assert with_ri == without_ri

    with open(gbwt_panel + ".ri", "r+b") as handle:
        handle.write(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="FastLocate"):
        run("corrupt")
