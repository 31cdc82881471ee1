"""Reproducibility: identical seeds give byte-identical outputs, across
engines and runs; Gibbs-dependent outputs depend only on the seed."""

import pytest

from rpvg_tpu import sim
from rpvg_tpu.pipeline import PipelineConfig, run_pipeline


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("determinism")
    panel = sim.build_panel(
        num_transcripts=3, num_haplotypes=2, exons_per_transcript=3,
        exon_length=90, variant_sites=1, seed=31,
    )
    records, _ = sim.simulate_read_pairs(
        panel, 200, read_length=60, frag_mean=150, frag_sd=12, seed=37
    )
    aln_path = str(tmp / "aln.json")
    sim.write_alignment_json(records, aln_path)
    info_path = str(tmp / "info.tsv")
    panel.write_info_tsv(info_path)
    return {"panel": panel, "alignments": aln_path, "info": info_path}


def run(dataset, prefix, seed, model="haplotype-transcripts", gibbs=0):
    config = PipelineConfig(
        graph=dataset["panel"].graph,
        paths=dataset["panel"].paths_index,
        alignments=dataset["alignments"],
        output_prefix=prefix,
        inference_model=model,
        path_info=dataset["info"] if model == "haplotype-transcripts" else None,
        rng_seed=seed,
        score_not_qual=True,
        num_gibbs_samples=gibbs,
    )
    run_pipeline(config)
    with open(prefix + ".txt") as handle:
        return handle.read()


def test_same_seed_identical_output(dataset, tmp_path):
    out_1 = run(dataset, str(tmp_path / "a"), seed=5)
    out_2 = run(dataset, str(tmp_path / "b"), seed=5)
    assert out_1 == out_2


def test_gibbs_seed_determinism(dataset, tmp_path):
    out_1 = run(dataset, str(tmp_path / "g1"), seed=5, gibbs=10)
    out_2 = run(dataset, str(tmp_path / "g2"), seed=5, gibbs=10)
    assert out_1 == out_2
    import gzip

    with gzip.open(str(tmp_path / "g1") + "_gibbs.txt.gz", "rt") as h1, gzip.open(
        str(tmp_path / "g2") + "_gibbs.txt.gz", "rt"
    ) as h2:
        assert h1.read() == h2.read()


def test_native_scan_thread_schedule_invariance(tmp_path):
    """The work-stealing native fragment pass must yield byte-identical
    outputs (abundance, joint, AND -b probability rows, which expose
    the dump's entry order) across thread counts and across repeated
    runs with the same thread count — the entry ordinals restore the
    canonical stream order regardless of which worker stole which
    chunk."""
    import gzip

    import numpy as np
    import pytest

    from rpvg_tpu.alignments import parse_multipath_alignment
    from rpvg_tpu.io import rpa
    from rpvg_tpu.native import native_available

    if not native_available():
        pytest.skip("native library unavailable")

    panel = sim.build_gene_panel(
        num_genes=12, isoforms_per_gene=5, num_haplotypes=4,
        exons_per_gene=6, exon_length=90, variant_sites=2, seed=13,
    )
    rng = np.random.default_rng(3)
    n = len(panel.path_names)
    ab = rng.dirichlet(np.ones(n) * 0.5)
    records, _ = sim.simulate_read_pairs(
        panel, 3000, read_length=80, frag_mean=200, frag_sd=18,
        abundances=ab, seed=23,
    )
    alns = [parse_multipath_alignment(r) for r in records]
    pairs = list(zip(alns[0::2], alns[1::2]))
    rpa_path = str(tmp_path / "aln.rpa")
    rpa.write_fragments(
        rpa_path, pairs, is_multipath=True, is_paired=True,
        frag_mean=200.0, frag_sd=18.0, block_size=256,
    )
    info = str(tmp_path / "info.tsv")
    panel.write_info_tsv(info)

    def run_once(tag, threads):
        prefix = str(tmp_path / tag)
        run_pipeline(PipelineConfig(
            graph=panel.graph, paths=panel.paths_index, alignments=rpa_path,
            output_prefix=prefix, inference_model="haplotype-transcripts",
            path_info=info, threads=threads, rng_seed=42,
            score_not_qual=True, frag_mean=200.0, frag_sd=18.0,
            write_probs=True,
        ))
        out = {}
        for sfx in (".txt", "_joint.txt"):
            with open(prefix + sfx, "rb") as handle:
                out[sfx] = handle.read()
        with gzip.open(prefix + "_probs.txt.gz", "rb") as handle:
            out["probs"] = handle.read()
        return out

    base = run_once("t4_a", 4)
    assert run_once("t4_b", 4) == base   # same threads, new schedule
    assert run_once("t1", 1) == base     # single-thread == multithread
    assert run_once("t2", 2) == base
