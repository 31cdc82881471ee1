"""End-to-end coverage of the remaining input / model modes:
single-end, long reads, single-path (GAM-style) records, Gibbs
haplotyping and strand-specific libraries."""

import numpy as np
import pytest

from rpvg_tpu import sim
from rpvg_tpu.pipeline import PipelineConfig, run_pipeline


@pytest.fixture(scope="module")
def panel():
    return sim.build_panel(
        num_transcripts=3, num_haplotypes=2, exons_per_transcript=3,
        exon_length=100, variant_sites=1, seed=3,
    )


def read_tsv(path):
    with open(path) as handle:
        header = handle.readline().rstrip("\n").split("\t")
        rows = [line.rstrip("\n").split("\t") for line in handle if line.strip()]
    return header, rows


def base_config(panel, aln_path, prefix, **kwargs):
    defaults = dict(
        graph=panel.graph,
        paths=panel.paths_index,
        alignments=aln_path,
        output_prefix=prefix,
        inference_model="transcripts",
        rng_seed=42,
        score_not_qual=True,
    )
    defaults.update(kwargs)
    return PipelineConfig(**defaults)


def test_single_end_mode(panel, tmp_path):
    records, _ = sim.simulate_single_reads(panel, 200, read_length=75, seed=21)
    aln_path = str(tmp_path / "se.json")
    sim.write_alignment_json(records, aln_path)

    prefix = str(tmp_path / "se_out")
    config = base_config(
        panel, aln_path, prefix, single_end=True, frag_mean=200.0, frag_sd=20.0
    )
    run_pipeline(config)
    header, rows = read_tsv(prefix + ".txt")
    counts = {row[0]: float(row[4]) for row in rows}
    assert sum(counts.values()) == pytest.approx(200, rel=1e-6)


def test_long_reads_mode(panel, tmp_path):
    records, _ = sim.simulate_single_reads(panel, 100, read_length=250, seed=22)
    aln_path = str(tmp_path / "lr.json")
    sim.write_alignment_json(records, aln_path)

    prefix = str(tmp_path / "lr_out")
    config = base_config(panel, aln_path, prefix, long_reads=True)
    run_pipeline(config)
    header, rows = read_tsv(prefix + ".txt")
    # Long-read mode disables effective-length normalisation.
    for row in rows[:-1]:
        assert float(row[3]) == float(row[2])
    counts = {row[0]: float(row[4]) for row in rows}
    assert sum(counts.values()) == pytest.approx(100, rel=1e-6)


def test_single_path_gam_style(panel, tmp_path):
    records, _ = sim.simulate_read_pairs(
        panel, 200, read_length=75, frag_mean=200, frag_sd=15, seed=23,
        as_multipath=False,
    )
    aln_path = str(tmp_path / "sp.json")
    sim.write_alignment_json(records, aln_path)

    prefix = str(tmp_path / "sp_out")
    config = base_config(panel, aln_path, prefix, single_path=True)
    run_pipeline(config)
    header, rows = read_tsv(prefix + ".txt")
    counts = {row[0]: float(row[4]) for row in rows}
    assert sum(counts.values()) == pytest.approx(200, rel=1e-6)


def test_haplotypes_gibbs_mode(panel, tmp_path):
    records, _ = sim.simulate_read_pairs(
        panel, 150, read_length=75, frag_mean=200, frag_sd=15, seed=24
    )
    aln_path = str(tmp_path / "hg.json")
    sim.write_alignment_json(records, aln_path)

    prefix = str(tmp_path / "hg_out")
    config = base_config(
        panel, aln_path, prefix, inference_model="haplotypes", use_hap_gibbs=True
    )
    run_pipeline(config)
    header, rows = read_tsv(prefix + ".txt")
    assert header == ["Name_1", "Name_2", "ClusterID", "HaplotypingProbability"]
    by_cluster = {}
    for row in rows:
        by_cluster.setdefault(row[2], 0.0)
        by_cluster[row[2]] += float(row[3])
    for total in by_cluster.values():
        assert total == pytest.approx(1.0, abs=0.02)


def test_strand_specific_fr(panel, tmp_path):
    records, _ = sim.simulate_read_pairs(
        panel, 150, read_length=75, frag_mean=200, frag_sd=15, seed=25
    )
    aln_path = str(tmp_path / "fr.json")
    sim.write_alignment_json(records, aln_path)

    prefix = str(tmp_path / "fr_out")
    config = base_config(panel, aln_path, prefix, library_type="fr")
    run_pipeline(config)
    header, rows = read_tsv(prefix + ".txt")
    counts = {row[0]: float(row[4]) for row in rows}
    assert sum(counts.values()) == pytest.approx(150, rel=1e-6)


def test_single_path_mode_on_multipath_records_errors_cleanly(tmp_path):
    """Multipath records read with --single-path have no `path` field:
    every record must serialize as unaligned (the native serializer
    used to crash with a raw AttributeError on the absent path), and
    the zero-usable-pairs condition must surface as a clean
    PipelineInputError -> rc=1 with no partial outputs, not an assert
    (which python -O would strip)."""
    import os

    from rpvg_tpu import sim
    from rpvg_tpu.cli import main

    panel = sim.build_panel(
        num_transcripts=6, num_haplotypes=2, exons_per_transcript=2,
        exon_length=60, variant_sites=1, seed=5,
    )
    records, _ = sim.simulate_read_pairs(
        panel, 40, read_length=60, frag_mean=150, frag_sd=12, seed=7,
        multipath_dag=True,
    )
    g = str(tmp_path / "g.json"); panel.write_graph_json(g)
    p = str(tmp_path / "p.json"); panel.write_panel_json(p)
    a = str(tmp_path / "a.json"); sim.write_alignment_json(records, a)
    out = str(tmp_path / "sp")
    rc = main(["-g", g, "-p", p, "-a", a, "-o", out, "-i", "transcripts",
               "-t", "1", "-r", "3", "--single-path"])
    assert rc == 1
    assert not os.path.exists(out + ".txt")
    assert not os.path.exists(out + ".txt.tmp")


def test_single_end_without_frag_params_errors_cleanly(tmp_path):
    """-s without --frag-mean/--frag-sd is a clean one-line error with
    rc=1 (the reference exits with a message, src/main.cpp:576-592),
    not an assert that python -O would strip."""
    import os

    from rpvg_tpu import sim
    from rpvg_tpu.cli import main

    panel = sim.build_panel(
        num_transcripts=6, num_haplotypes=2, exons_per_transcript=2,
        exon_length=60, variant_sites=1, seed=5,
    )
    records, _ = sim.simulate_read_pairs(
        panel, 20, read_length=60, frag_mean=150, frag_sd=12, seed=7
    )
    g = str(tmp_path / "g.json"); panel.write_graph_json(g)
    p = str(tmp_path / "p.json"); panel.write_panel_json(p)
    a = str(tmp_path / "a.json"); sim.write_alignment_json(records, a)
    out = str(tmp_path / "se")
    rc = main(["-g", g, "-p", p, "-a", a, "-o", out, "-i", "transcripts",
               "-t", "1", "-r", "3", "-s"])
    assert rc == 1
    assert not os.path.exists(out + ".txt")


def test_python_spec_pipeline_matches_native_byte_for_byte(tmp_path):
    """With the native library disabled, the pure-Python specification
    pipeline (projection, dedup, clustering, probabilities, inference,
    writers) produces byte-identical outputs to the C++-kernel
    pipeline — the spec-vs-speed-twin differential at full-pipeline
    granularity."""
    import os

    from rpvg_tpu import native, sim
    from rpvg_tpu.cli import main

    panel = sim.build_panel(
        num_transcripts=10, num_haplotypes=4, exons_per_transcript=3,
        exon_length=70, variant_sites=2, seed=5,
    )
    records, _ = sim.simulate_read_pairs(
        panel, 200, read_length=70, frag_mean=170, frag_sd=15, seed=7,
        with_errors=True, multipath_dag=True,
    )
    g = str(tmp_path / "g.json"); panel.write_graph_json(g)
    p = str(tmp_path / "p.json"); panel.write_panel_json(p)
    a = str(tmp_path / "a.json"); sim.write_alignment_json(records, a)
    f = str(tmp_path / "i.tsv"); panel.write_info_tsv(f)
    base = ["-g", g, "-p", p, "-a", a, "-t", "2", "-r", "7"]

    for label, extra in [
        ("ht", ["-i", "haplotype-transcripts", "-f", f]),
        ("strains", ["-i", "strains"]),
    ]:
        o_native = str(tmp_path / f"nat_{label}")
        assert main(base + ["-o", o_native] + extra) == 0
        from rpvg_tpu.infer import matrices

        native._lib = None
        real_load = native.load_library
        native.load_library = lambda: None
        prev_collapse = matrices._native_collapse
        matrices._native_collapse = False  # drop the memoised handle too
        try:
            o_py = str(tmp_path / f"py_{label}")
            assert main(base + ["-o", o_py] + extra) == 0
        finally:
            native.load_library = real_load
            native._lib = None
            matrices._native_collapse = prev_collapse
        with open(o_native + ".txt", "rb") as na, open(o_py + ".txt", "rb") as py:
            assert na.read() == py.read(), f"{label}: python spec diverged from native"
