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
