"""Columnar fragment-index fast path: the array-based clustering /
partition / blob assembly must reproduce the materialised per-entry
path byte-for-byte (same outputs, same cluster structure)."""

import os

import numpy as np
import pytest

from rpvg_tpu import sim
from rpvg_tpu.pipeline import (
    ColumnarFragmentIndex,
    PipelineConfig,
    build_finder,
    collect_fragments,
    resolve_pre_fragment_dist,
    run_inference_phases,
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("columnar")
    panel = sim.build_panel(
        num_transcripts=40, num_haplotypes=4, exons_per_transcript=4,
        exon_length=90, variant_sites=2, seed=21,
    )
    records, _ = sim.simulate_read_pairs(
        panel, 1500, read_length=80, frag_mean=210, frag_sd=18, seed=22
    )
    aln = str(tmp / "aln.json")
    info = str(tmp / "info.tsv")
    sim.write_alignment_json(records, aln)
    panel.write_info_tsv(info)
    return panel, aln, info, tmp


def _config(panel, aln, info, prefix, model, **kw):
    return PipelineConfig(
        graph=panel.graph,
        paths=panel.paths_index,
        alignments=aln,
        output_prefix=prefix,
        inference_model=model,
        path_info=info if model == "haplotype-transcripts" else None,
        rng_seed=7,
        score_not_qual=True,
        **kw,
    )


@pytest.mark.parametrize("model", ["transcripts", "haplotype-transcripts", "strains"])
def test_columnar_matches_materialized(dataset, tmp_path, model):
    panel, aln, info, _ = dataset
    config = _config(panel, aln, info, "", model)
    pre = resolve_pre_fragment_dist(config)
    finder = build_finder(config, panel.paths_index, pre)
    if not hasattr(finder, "project_and_index"):
        pytest.skip("native engine unavailable")

    index = collect_fragments(config, finder, pre, columnar=True)
    assert isinstance(index, ColumnarFragmentIndex)

    out_a = str(tmp_path / f"{model}_columnar")
    config_a = _config(panel, aln, info, out_a, model)
    run_inference_phases(config_a, panel.paths_index, index, pre, finder=finder)

    out_b = str(tmp_path / f"{model}_legacy")
    config_b = _config(panel, aln, info, out_b, model)
    run_inference_phases(
        config_b, panel.paths_index, index.to_fragment_index(), pre, finder=finder
    )

    with open(out_a + ".txt") as fa, open(out_b + ".txt") as fb:
        assert fa.read() == fb.read()
    if model == "haplotype-transcripts":
        with open(out_a + "_joint.txt") as fa, open(out_b + "_joint.txt") as fb:
            assert fa.read() == fb.read()


def test_columnar_entry_list_roundtrip(dataset):
    panel, aln, info, _ = dataset
    config = _config(panel, aln, info, "", "transcripts")
    pre = resolve_pre_fragment_dist(config)
    finder = build_finder(config, panel.paths_index, pre)
    if not hasattr(finder, "project_and_index"):
        pytest.skip("native engine unavailable")

    index = collect_fragments(config, finder, pre, columnar=True)
    cols = index.columnar
    entries = cols.entry_list()
    assert len(entries) == len(cols) == index.num_entries()
    # Raw byte slices must tile the raw region exactly and embed the
    # dedup count in their first 8 bytes.
    import struct

    for i in (0, len(entries) // 2, len(entries) - 1):
        located, count, raw = entries[i]
        assert struct.unpack_from("<Q", raw, 0)[0] == count
        assert located.anchor == int(cols.anchors[i])
        assert raw == cols.data[cols.raw_bounds[i]:cols.raw_bounds[i + 1]]

    # gather_blob over all entries in dump order reproduces the raw
    # region verbatim.
    order = np.arange(len(entries), dtype=np.int64)
    blob, lens = cols.gather_blob(order)
    start = int(cols.raw_bounds[0])
    end = int(cols.raw_bounds[-1])
    assert blob.tobytes() == cols.data[start:end]
    assert lens.sum() == end - start


def test_columnar_prob_writer_matches_materialized(dataset, tmp_path):
    # -b through the columnar fast path (native-formatted blocks) must
    # be byte-identical to the legacy per-cluster ReadPathProbs path.
    import gzip

    panel, aln, info, _ = dataset
    config = _config(panel, aln, info, "", "haplotype-transcripts")
    pre = resolve_pre_fragment_dist(config)
    finder = build_finder(config, panel.paths_index, pre)
    if not hasattr(finder, "format_prob_rows"):
        pytest.skip("native engine unavailable")

    index = collect_fragments(config, finder, pre, columnar=True)

    out_a = str(tmp_path / "probs_columnar")
    config_a = _config(panel, aln, info, out_a, "haplotype-transcripts",
                       write_probs=True)
    run_inference_phases(config_a, panel.paths_index, index, pre, finder=finder)

    out_b = str(tmp_path / "probs_legacy")
    config_b = _config(panel, aln, info, out_b, "haplotype-transcripts",
                       write_probs=True)
    run_inference_phases(
        config_b, panel.paths_index, index.to_fragment_index(), pre, finder=finder
    )

    with gzip.open(out_a + "_probs.txt.gz", "rt") as fa, \
            gzip.open(out_b + "_probs.txt.gz", "rt") as fb:
        assert fa.read() == fb.read()
    with open(out_a + ".txt") as fa, open(out_b + ".txt") as fb:
        assert fa.read() == fb.read()


def test_columnar_estimate_writers_match_objects(dataset, tmp_path, monkeypatch):
    # The native output composer (rpvg_compose_hapjoint_rows, fed by the
    # fused kernel's set streams) must be byte-identical to the object
    # writers for both haplotype-transcripts estimate files.
    panel, aln, info, _ = dataset

    def run(prefix, compose):
        monkeypatch.setenv("RPVG_TPU_COMPOSE_OUT", "1" if compose else "0")
        config = _config(panel, aln, info, prefix, "haplotype-transcripts")
        pre = resolve_pre_fragment_dist(config)
        finder = build_finder(config, panel.paths_index, pre)
        index = collect_fragments(config, finder, pre, columnar=True)
        run_inference_phases(config, panel.paths_index, index, pre, finder=finder)

    out_a = str(tmp_path / "composed")
    out_b = str(tmp_path / "objects")
    run(out_a, True)
    run(out_b, False)
    for suffix in (".txt", "_joint.txt"):
        with open(out_a + suffix) as fa, open(out_b + suffix) as fb:
            assert fa.read() == fb.read(), suffix


def test_columnar_estimate_writers_match_objects_hybrid(dataset, tmp_path, monkeypatch):
    # Hybrid accelerator runs defer large subset-EM matrices to the
    # device; the composer splices those clusters' sets from their
    # estimates.  Forced here via the test hook on the CPU backend.
    panel, aln, info, _ = dataset
    # Cutoff 8 defers ~16 of the ~103 slots on this dataset (probed),
    # giving a genuinely mixed combined/deferred population.
    monkeypatch.setenv("RPVG_TPU_FORCE_HYBRID_EM_AREA", "8")

    def run(prefix, compose):
        monkeypatch.setenv("RPVG_TPU_COMPOSE_OUT", "1" if compose else "0")
        config = _config(panel, aln, info, prefix, "haplotype-transcripts")
        pre = resolve_pre_fragment_dist(config)
        finder = build_finder(config, panel.paths_index, pre)
        index = collect_fragments(config, finder, pre, columnar=True)
        run_inference_phases(config, panel.paths_index, index, pre, finder=finder)

    out_a = str(tmp_path / "composed_hybrid")
    out_b = str(tmp_path / "objects_hybrid")
    run(out_a, True)
    run(out_b, False)
    for suffix in (".txt", "_joint.txt"):
        with open(out_a + suffix) as fa, open(out_b + suffix) as fb:
            assert fa.read() == fb.read(), suffix


@pytest.mark.parametrize("model", ["transcripts", "strains"])
def test_columnar_abundance_writer_matches_objects(dataset, tmp_path, monkeypatch, model):
    # The per-path abundance composer (rpvg_compose_abundance_rows) must
    # be byte-identical to AbundanceEstimatesWriter for both singleton-
    # set models, with the fused and staged strains engines.
    from rpvg_tpu.native import _load_compose_ab_lib

    if _load_compose_ab_lib() is None:
        pytest.skip("native composer unavailable")
    panel, aln, info, _ = dataset

    def run(prefix, compose, fused="1"):
        monkeypatch.setenv("RPVG_TPU_COMPOSE_OUT", "1" if compose else "0")
        monkeypatch.setenv("RPVG_TPU_FUSED_STRAINS", fused)
        config = _config(panel, aln, info, prefix, model)
        pre = resolve_pre_fragment_dist(config)
        finder = build_finder(config, panel.paths_index, pre)
        index = collect_fragments(config, finder, pre, columnar=True)
        run_inference_phases(config, panel.paths_index, index, pre, finder=finder)

    out_a = str(tmp_path / "composed")
    out_b = str(tmp_path / "objects")
    run(out_a, True)
    run(out_b, False)
    with open(out_a + ".txt") as fa, open(out_b + ".txt") as fb:
        assert fa.read() == fb.read()

    if model == "strains":
        out_c = str(tmp_path / "composed_staged")
        run(out_c, True, fused="0")
        with open(out_a + ".txt") as fa, open(out_c + ".txt") as fc:
            assert fa.read() == fc.read()
