"""Measured-policy slot routing (parallel/linkprobe.py): the largest
clusters' nested inference dispatches to the device while the native
kernel handles the rest concurrently.  Forced on the CPU backend via
RPVG_TPU_DEVICE_SLOT_AREA, the routed path must be byte-identical to the
all-native run (the XLA-CPU EM kernel is pinned bitwise to the C++ EM
elsewhere; this pins the two-pass emit/dispatch/combine plumbing)."""

import numpy as np
import pytest

from rpvg_tpu import sim
from rpvg_tpu.alignments import parse_multipath_alignment
from rpvg_tpu.pipeline import PipelineConfig, run_pipeline


@pytest.fixture(scope="module")
def gene_dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("routing")
    panel = sim.build_gene_panel(
        num_genes=30, isoforms_per_gene=6, num_haplotypes=4,
        exons_per_gene=8, exon_length=100, variant_sites=3, seed=5,
    )
    rng = np.random.default_rng(7)
    n = len(panel.path_names)
    gene_of = np.array([int(nm[4:9]) for nm in panel.path_names])
    gab = rng.dirichlet(np.ones(gene_of.max() + 1) * 0.3)
    ab = gab[gene_of] * rng.dirichlet(np.ones(n) * 2.0)
    ab /= ab.sum()
    records, _ = sim.simulate_read_pairs(
        panel, 5000, read_length=90, frag_mean=220, frag_sd=20,
        abundances=ab, seed=17,
    )
    alns = [
        (parse_multipath_alignment(a), parse_multipath_alignment(b))
        for a, b in zip(records[0::2], records[1::2])
    ]
    info = str(tmp / "info.tsv")
    panel.write_info_tsv(info)
    return {"panel": panel, "alns": alns, "info": info, "tmp": tmp}


def _run(ds, tag, gibbs=0):
    import gzip

    prefix = str(ds["tmp"] / f"out_{tag}")
    run_pipeline(
        PipelineConfig(
            graph=ds["panel"].graph, paths=ds["panel"].paths_index,
            alignments=ds["alns"], output_prefix=prefix,
            inference_model="haplotype-transcripts", path_info=ds["info"],
            threads=2, rng_seed=42, score_not_qual=True,
            frag_mean=220.0, frag_sd=20.0, num_gibbs_samples=gibbs,
        )
    )
    out = {}
    for sfx in (".txt", "_joint.txt"):
        out[sfx] = open(prefix + sfx, "rb").read()
    if gibbs:
        out["gibbs"] = gzip.open(prefix + "_gibbs.txt.gz", "rb").read()
    return out


@pytest.mark.parametrize("gibbs", [0, 6])
def test_slot_routing_byte_identical(gene_dataset, monkeypatch, gibbs):
    base = _run(gene_dataset, f"base{gibbs}", gibbs=gibbs)
    monkeypatch.setenv("RPVG_TPU_DEVICE_SLOT_AREA", "500")
    routed = _run(gene_dataset, f"routed{gibbs}", gibbs=gibbs)
    assert base == routed


def test_bounded_escalation_concat_byte_identical(gene_dataset, monkeypatch):
    """Bounded-EM escalation (RPVG_TPU_EM_BOUND) with host rebatching
    must be byte-identical to the uninterrupted run, and the rebatch
    must take run_native_em's zero-copy concat fast path (the emitted
    mats/cnts streams hold exactly the escalated tasks)."""
    from rpvg_tpu.infer import batching

    base = _run(gene_dataset, "escbase")

    seen = {"concat": 0, "calls": 0}
    orig = batching.run_native_em

    def spy(cluster_inputs, *args, **kwargs):
        seen["calls"] += 1
        if kwargs.get("concat") is not None:
            seen["concat"] += 1
        return orig(cluster_inputs, *args, **kwargs)

    monkeypatch.setattr(batching, "run_native_em", spy)
    monkeypatch.setattr(
        "rpvg_tpu.infer.batched_models.run_native_em", spy, raising=False
    )
    monkeypatch.setenv("RPVG_TPU_EM_BOUND", "3")
    escalated = _run(gene_dataset, "escbound")
    assert base == escalated
    assert seen["concat"] >= 1, (
        f"concat fast path never taken ({seen['calls']} run_native_em calls)"
    )


def test_gene_panel_builds_wide_clusters(gene_dataset):
    # The gene-structured panel must produce genuinely multimapping
    # clusters (isoforms x haplotypes paths sharing reads) — the regime
    # the reference's size-sorted cluster scheduling exists for.
    from rpvg_tpu.clustering import PathClusters
    from rpvg_tpu.pipeline import (
        PipelineConfig, build_finder, collect_fragments,
        resolve_pre_fragment_dist,
    )

    ds = gene_dataset
    config = PipelineConfig(
        graph=ds["panel"].graph, paths=ds["panel"].paths_index,
        alignments=ds["alns"], output_prefix=str(ds["tmp"] / "w"),
        inference_model="haplotype-transcripts", path_info=ds["info"],
        rng_seed=1, score_not_qual=True, frag_mean=220.0, frag_sd=20.0,
    )
    pre = resolve_pre_fragment_dist(config)
    finder = build_finder(config, ds["panel"].paths_index, pre)
    index = collect_fragments(config, finder, pre, columnar=True)
    cols = index.columnar
    clusters = PathClusters.from_columnar(ds["panel"].paths_index, cols)
    sizes = np.bincount(clusters.path_to_cluster)
    # At least one cluster spans >= 3 isoforms x 4 haplotypes paths.
    assert sizes.max() >= 12


@pytest.mark.parametrize("opts", [
    {"ploidy": 3},
    {"ind_hap_inference": True},
    {"use_hap_gibbs": True},
])
def test_gene_panel_variant_configs(gene_dataset, opts):
    """The variant nested configurations (full-enumeration ploidy 3,
    independent groups, posterior Gibbs) run end-to-end on the
    gene-structured multimapping panel and produce well-formed rows."""
    ds = gene_dataset
    prefix = str(ds["tmp"] / ("var_" + "_".join(opts)))
    run_pipeline(
        PipelineConfig(
            graph=ds["panel"].graph, paths=ds["panel"].paths_index,
            alignments=ds["alns"], output_prefix=prefix,
            inference_model="haplotype-transcripts", path_info=ds["info"],
            threads=2, rng_seed=42, score_not_qual=True,
            frag_mean=220.0, frag_sd=20.0, **opts,
        )
    )
    with open(prefix + ".txt") as handle:
        header = handle.readline().rstrip("\n").split("\t")
        rows = [line.rstrip("\n").split("\t") for line in handle if line.strip()]
    assert header[0] == "Name" and rows[-1][0] == "Unknown"
    assert len(rows) > len(ds["panel"].path_names) // 2
    count_col = header.index("ReadCount")
    total = sum(float(r[count_col]) for r in rows)
    assert total > 0


def test_multipath_dag_projection_soft_evidence(gene_dataset):
    """mpmap-shaped DAG records: a variant-crossing read projects to its
    true haplotype at full score AND to every sibling haplotype at a
    1-base mismatch penalty (-5 = match 1 -> mismatch -4), through both
    projection engines — the soft allele evidence the reference's
    multipath DFS weighs (alignment_path_finder.cpp:685-806)."""
    from rpvg_tpu import sim
    from rpvg_tpu.alignments import parse_multipath_alignment
    from tests.helpers import build_index, locate_ids

    panel = gene_dataset["panel"]
    recs, _ = sim.simulate_read_pairs(
        panel, 400, read_length=90, frag_mean=220, frag_sd=20, seed=23,
        multipath_dag=True,
    )
    singles, _ = sim.simulate_read_pairs(
        panel, 400, read_length=90, frag_mean=220, frag_sd=20, seed=23,
    )
    dag_pairs = [
        (i, parse_multipath_alignment(recs[2 * i]), parse_multipath_alignment(recs[2 * i + 1]))
        for i in range(200)
        if len(recs[2 * i].get("subpath", [])) > 1
        or len(recs[2 * i + 1].get("subpath", [])) > 1
    ]
    assert dag_pairs, "no variant-crossing fragments simulated"

    import sys as _sys

    _sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_projection_partial import make_finder

    checked = 0
    for engine in ("python", "native"):
        # Partials off: every candidate is a full-length walk, so score
        # deltas are exact multiples of the per-site mismatch penalty.
        finder = make_finder(
            panel.paths_index, max_partial_offset=0, engine=engine,
            min_best_score_filter=0.0, score_not_qual=True,
        )
        for i, a, b in dag_pairs[:20]:
            sa = parse_multipath_alignment(singles[2 * i])
            sb = parse_multipath_alignment(singles[2 * i + 1])
            dag_paths = finder.find_paired_alignment_paths(a, b)
            single_paths = finder.find_paired_alignment_paths(sa, sb)
            best_single = max(p.score_sum for p in single_paths)
            by_score = {}
            for p in dag_paths:
                if p.frag_length == 0:
                    continue
                for pid in locate_ids(panel.paths_index, p):
                    by_score.setdefault(int(pid), p.score_sum)
            # The true haplotype keeps the full single-record score.
            assert max(by_score.values()) == best_single
            # Sibling haplotypes appear at >= 1 mismatch penalty below.
            penalised = [s for s in by_score.values() if s < best_single]
            if penalised:
                assert all(
                    (best_single - s) % sim.MISMATCH_DELTA == 0 for s in penalised
                )
                checked += 1
    assert checked > 0
