"""End-to-end pipeline tests on synthesised pantranscriptomes (the
bundled reference example's binary inputs are stripped, so fixtures are
regenerated via rpvg_tpu.sim)."""

import json
import math

import numpy as np
import pytest

from rpvg_tpu import sim
from rpvg_tpu.pipeline import PipelineConfig, run_pipeline


@pytest.fixture(scope="module")
def small_dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    panel = sim.build_panel(
        num_transcripts=3, num_haplotypes=2, exons_per_transcript=3,
        exon_length=100, variant_sites=1, seed=3,
    )
    abundances = np.array([0.4, 0.05, 0.25, 0.05, 0.2, 0.05])
    records, true_counts = sim.simulate_read_pairs(
        panel, 400, read_length=75, frag_mean=200, frag_sd=15,
        abundances=abundances, seed=11,
    )

    graph_path = str(tmp / "graph.json")
    panel_path = str(tmp / "panel.json")
    aln_path = str(tmp / "aln.json")
    info_path = str(tmp / "info.tsv")
    panel.write_graph_json(graph_path)
    panel.write_panel_json(panel_path)
    sim.write_alignment_json(records, aln_path)
    panel.write_info_tsv(info_path)
    return {
        "tmp": tmp,
        "panel": panel,
        "true_counts": true_counts,
        "graph": graph_path,
        "paths": panel_path,
        "alignments": aln_path,
        "info": info_path,
        "num_pairs": 400,
    }


def read_tsv(path):
    with open(path) as handle:
        header = handle.readline().rstrip("\n").split("\t")
        rows = [line.rstrip("\n").split("\t") for line in handle if line.strip()]
    return header, rows


def test_transcripts_model_end_to_end(small_dataset, tmp_path):
    prefix = str(tmp_path / "out")
    config = PipelineConfig(
        graph=small_dataset["graph"],
        paths=small_dataset["paths"],
        alignments=small_dataset["alignments"],
        output_prefix=prefix,
        inference_model="transcripts",
        rng_seed=42,
        score_not_qual=True,
        write_probs=True,
    )
    stats = run_pipeline(config)
    assert stats["unaligned_reads"] == 0

    header, rows = read_tsv(prefix + ".txt")
    assert header == ["Name", "ClusterID", "Length", "EffectiveLength", "ReadCount", "TPM"]
    assert rows[-1][0] == "Unknown"

    counts = {row[0]: float(row[4]) for row in rows}
    total = sum(counts.values())
    assert total == pytest.approx(small_dataset["num_pairs"], rel=1e-6)

    # Estimated counts track the simulation truth.
    names = small_dataset["panel"].path_names
    true_counts = small_dataset["true_counts"]
    est = np.array([counts[name] for name in names])
    # Haplotypes of the same transcript are hard to distinguish when the
    # fragment spans no variant site; compare at transcript level.
    est_t = est.reshape(-1, 2).sum(axis=1)
    true_t = true_counts.reshape(-1, 2).sum(axis=1)
    assert np.corrcoef(est_t, true_t)[0, 1] > 0.95

    # TPM column consistency.
    for row in rows[:-1]:
        eff_len = float(row[3])
        if eff_len > 0:
            expected_tpm = float(row[4]) / eff_len
            assert float(row[5]) == pytest.approx(
                expected_tpm * 1e6 / sum(
                    float(r[4]) / float(r[3]) for r in rows[:-1] if float(r[3]) > 0
                ),
                rel=1e-4,
            )

    # Probability clusters file exists and is parseable.
    import gzip

    with gzip.open(prefix + "_probs.txt.gz", "rt") as handle:
        content = handle.read()
    assert content.startswith("#")


def test_haplotypes_model_end_to_end(small_dataset, tmp_path):
    prefix = str(tmp_path / "hap")
    config = PipelineConfig(
        graph=small_dataset["graph"],
        paths=small_dataset["paths"],
        alignments=small_dataset["alignments"],
        output_prefix=prefix,
        inference_model="haplotypes",
        rng_seed=42,
        score_not_qual=True,
        ploidy=2,
    )
    run_pipeline(config)
    header, rows = read_tsv(prefix + ".txt")
    assert header == ["Name_1", "Name_2", "ClusterID", "HaplotypingProbability"]
    assert rows
    for row in rows:
        prob = float(row[3])
        assert 0.0 <= prob <= 1.0 + 1e-9
    # Posteriors per cluster sum to ~1.
    by_cluster = {}
    for row in rows:
        by_cluster.setdefault(row[2], 0.0)
        by_cluster[row[2]] += float(row[3])
    for total in by_cluster.values():
        assert total == pytest.approx(1.0, abs=1e-4)


def test_haplotype_transcripts_model_end_to_end(small_dataset, tmp_path):
    prefix = str(tmp_path / "ht")
    config = PipelineConfig(
        graph=small_dataset["graph"],
        paths=small_dataset["paths"],
        alignments=small_dataset["alignments"],
        output_prefix=prefix,
        inference_model="haplotype-transcripts",
        path_info=small_dataset["info"],
        rng_seed=42,
        score_not_qual=True,
        ploidy=2,
        num_gibbs_samples=10,
    )
    stats = run_pipeline(config)

    header, rows = read_tsv(prefix + ".txt")
    assert header == [
        "Name", "ClusterID", "Length", "EffectiveLength",
        "HaplotypeProbability", "ReadCount", "TPM",
    ]
    counts = {row[0]: float(row[5]) for row in rows}
    assert sum(counts.values()) == pytest.approx(small_dataset["num_pairs"], rel=1e-6)

    header_joint, rows_joint = read_tsv(prefix + "_joint.txt")
    assert header_joint[:4] == ["Name_1", "Name_2", "ClusterID", "HaplotypingProbability"]
    assert rows_joint[-1][0] == "Unknown"

    # Gibbs samples file written.
    import gzip

    with gzip.open(prefix + "_gibbs.txt.gz", "rt") as handle:
        gibbs_header = handle.readline().split("\t")
    assert gibbs_header[0] == "Name" and len(gibbs_header) == 12


def test_strains_model_end_to_end(small_dataset, tmp_path):
    prefix = str(tmp_path / "strains")
    config = PipelineConfig(
        graph=small_dataset["graph"],
        paths=small_dataset["paths"],
        alignments=small_dataset["alignments"],
        output_prefix=prefix,
        inference_model="strains",
        rng_seed=42,
        score_not_qual=True,
    )
    run_pipeline(config)
    header, rows = read_tsv(prefix + ".txt")
    counts = {row[0]: float(row[4]) for row in rows}
    assert sum(counts.values()) == pytest.approx(small_dataset["num_pairs"], rel=1e-6)


def test_transcripts_collapse_haps(small_dataset, tmp_path):
    # transcripts model + info file collapses haplotypes per transcript.
    prefix = str(tmp_path / "collapsed")
    config = PipelineConfig(
        graph=small_dataset["graph"],
        paths=small_dataset["paths"],
        alignments=small_dataset["alignments"],
        output_prefix=prefix,
        inference_model="transcripts",
        path_info=small_dataset["info"],
        rng_seed=42,
        score_not_qual=True,
    )
    run_pipeline(config)
    header, rows = read_tsv(prefix + ".txt")
    names = [row[0] for row in rows[:-1]]
    assert all(name.startswith("ENST") and "_h" not in name for name in names)
    counts = {row[0]: float(row[4]) for row in rows}
    assert sum(counts.values()) == pytest.approx(small_dataset["num_pairs"], rel=1e-6)


def test_cli_smoke(small_dataset, tmp_path):
    from rpvg_tpu.cli import main

    prefix = str(tmp_path / "cli_out")
    rc = main(
        [
            "-g", small_dataset["graph"],
            "-p", small_dataset["paths"],
            "-a", small_dataset["alignments"],
            "-o", prefix,
            "-i", "transcripts",
            "-r", "7",
            "--score-not-qual",
        ]
    )
    assert rc == 0
    header, rows = read_tsv(prefix + ".txt")
    assert rows[-1][0] == "Unknown"


def test_path_meta_fast_stream_matches_object_gather(small_dataset, tmp_path, monkeypatch):
    """The columnar (names, lens, effs, n_paths) stream handed to the
    native composers must equal the per-object PathInfo gather exactly
    — guards the est.paths <-> concat-stream invariant the fast path
    relies on (PathInfo.name == panel path name when collapse is off)."""
    from rpvg_tpu import pipeline as pl

    orig = pl._gather_path_row_meta
    checked = {}

    def spy(results, path_meta=None):
        fast = orig(results, path_meta)
        if path_meta is not None:
            slow = orig(results, None)
            assert fast is not None and slow is not None
            assert list(fast[0]) == list(slow[0])  # names
            assert [int(x) for x in fast[1]] == [int(x) for x in slow[1]]
            assert [float(x) for x in fast[2]] == [float(x) for x in slow[2]]
            assert list(fast[3]) == list(slow[3])  # cluster ids
            assert [int(x) for x in fast[4]] == [int(x) for x in slow[4]]
            checked["ok"] = True
        return fast

    monkeypatch.setattr(pl, "_gather_path_row_meta", spy)
    prefix = str(tmp_path / "meta_out")
    config = PipelineConfig(
        graph=small_dataset["graph"],
        paths=small_dataset["paths"],
        alignments=small_dataset["alignments"],
        output_prefix=prefix,
        inference_model="haplotype-transcripts",
        path_info=small_dataset["info"],
        threads=2,
        rng_seed=7,
        score_not_qual=True,
    )
    run_pipeline(config)
    if checked.get("ok"):
        return
    # The fast stream only exists on the native columnar path; without
    # the native engine the object gather is the only implementation.
    from rpvg_tpu.native import native_available

    assert not native_available()
