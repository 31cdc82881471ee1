"""Golden-output regression tests.

A fixed synthetic dataset is regenerated deterministically and run
through every model; outputs must match the committed golden files
byte-for-byte.  This pins the full numeric contract (projection,
probabilities, EM, posteriors, TPM, formatting) across refactors —
regenerate deliberately with:

    python tests/test_golden.py --regenerate
"""

import os
import sys

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

MODELS = [
    ("transcripts", {}),
    ("haplotypes", {}),
    ("strains", {}),
    ("haplotype-transcripts", {"with_info": True}),
    # The reference's DEFAULT scoring regime (quality-adjusted,
    # src/main.cpp:385) over reads with quality-driven errors — pinned
    # byte-for-byte for every model, not just the flagship.
    ("transcripts-qual", {"qual": True}),
    ("haplotypes-qual", {"qual": True}),
    ("strains-qual", {"qual": True}),
    ("haplotype-transcripts-qual", {"with_info": True, "qual": True}),
    # Full-realism regime: gene-structured panel (isoforms share exon
    # and allele nodes, real multimapping), quality-driven errors with
    # qual-adjusted scoring, AND mpmap-shaped multipath DAG records
    # with scored allele alternatives — pins the noise model the
    # accuracy thresholds only bound.
    (
        "haplotype-transcripts-dag",
        {"with_info": True, "qual": True, "gene_panel": True, "dag": True},
    ),
]


def make_dataset(tmp_dir, qual=False, gene_panel=False, dag=False):
    from rpvg_tpu import sim

    if gene_panel:
        panel = sim.build_gene_panel(
            num_genes=3, isoforms_per_gene=3, num_haplotypes=4,
            exons_per_gene=5, exon_length=80, variant_sites=2, seed=101,
        )
    else:
        panel = sim.build_panel(
            num_transcripts=4, num_haplotypes=2, exons_per_transcript=3,
            exon_length=80, variant_sites=1, seed=101,
        )
    records, _ = sim.simulate_read_pairs(
        panel, 300, read_length=60, frag_mean=150, frag_sd=12, seed=103,
        with_errors=qual, multipath_dag=dag,
    )
    aln_path = os.path.join(tmp_dir, "aln.json")
    sim.write_alignment_json(records, aln_path)
    info_path = os.path.join(tmp_dir, "info.tsv")
    panel.write_info_tsv(info_path)
    return panel, aln_path, info_path


def run_model(panel, aln_path, info_path, model, opts, prefix):
    from rpvg_tpu.pipeline import PipelineConfig, run_pipeline

    config = PipelineConfig(
        graph=panel.graph,
        paths=panel.paths_index,
        alignments=aln_path,
        output_prefix=prefix,
        inference_model=model.replace("-qual", "").replace("-dag", ""),
        path_info=info_path if opts.get("with_info") else None,
        rng_seed=99,
        score_not_qual=not opts.get("qual", False),
    )
    run_pipeline(config)
    outputs = {model + ".txt": prefix + ".txt"}
    if model.startswith("haplotype-transcripts"):
        outputs[model + "_joint.txt"] = prefix + "_joint.txt"
    return outputs


@pytest.mark.parametrize("model,opts", MODELS)
def test_golden_outputs(model, opts, tmp_path):
    panel, aln_path, info_path = make_dataset(
        str(tmp_path), qual=opts.get("qual", False),
        gene_panel=opts.get("gene_panel", False),
        dag=opts.get("dag", False),
    )
    outputs = run_model(panel, aln_path, info_path, model, opts, str(tmp_path / "out"))
    for golden_name, produced_path in outputs.items():
        golden_path = os.path.join(GOLDEN_DIR, golden_name)
        assert os.path.exists(golden_path), (
            f"golden file missing: {golden_name}; regenerate with "
            "python tests/test_golden.py --regenerate"
        )
        with open(produced_path) as produced, open(golden_path) as golden:
            assert produced.read() == golden.read(), f"{golden_name} diverged"


def regenerate():
    import tempfile

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        for model, opts in MODELS:
            panel, aln_path, info_path = make_dataset(
                tmp, qual=opts.get("qual", False),
                gene_panel=opts.get("gene_panel", False),
                dag=opts.get("dag", False),
            )
            outputs = run_model(
                panel, aln_path, info_path, model, opts, os.path.join(tmp, model)
            )
            for golden_name, produced_path in outputs.items():
                with open(produced_path) as src:
                    with open(os.path.join(GOLDEN_DIR, golden_name), "w") as dst:
                        dst.write(src.read())
                print(f"wrote {golden_name}")


if __name__ == "__main__":
    if "--regenerate" in sys.argv:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        regenerate()
    else:
        print("use --regenerate to rebuild golden files")
