"""Statistical accuracy against simulated ground truth.

The reference establishes output-level correctness on simulated data
with known expression (Sibbesen et al., Nature Methods 2023); this runs
the same experiment end-to-end: simulate fragments from a
pantranscriptome with a diploid-consistent expression profile, quantify
with both abundance models, and score the estimates.  Thresholds sit
well below the measured values (spearman_expressed ~0.98, mard ~0.16,
false_mass ~0.001 at this scale) so the test guards gross regressions,
not run-to-run wiggle.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from accuracy_eval import evaluate


def test_abundance_accuracy_on_simulated_truth():
    results = evaluate(num_pairs=8000, num_transcripts=300, seed=11)
    for model in ("transcripts", "haplotype-transcripts"):
        metrics = results[model]
        assert metrics["spearman_expressed"] > 0.9, (model, metrics)
        assert metrics["mard_expressed"] < 0.35, (model, metrics)
        assert metrics["false_mass"] < 0.01, (model, metrics)
        assert metrics["detected_frac"] > 0.85, (model, metrics)
        # Estimated mass accounts for (nearly) every simulated fragment.
        assert metrics["total_est"] > 0.97 * metrics["total_true"], (model, metrics)


def test_abundance_accuracy_qual_adjusted_errors():
    """The reference's DEFAULT regime (quality-adjusted scoring,
    src/main.cpp:385) over reads with quality-driven sequencing errors:
    accuracy must hold up under realistic error, not just perfect
    reads.  Measured at this scale: spearman_expressed ~0.97/0.96,
    false_mass ~0.002."""
    results = evaluate(
        num_pairs=8000, num_transcripts=300, seed=11,
        with_errors=True, score_not_qual=False,
    )
    for model in ("transcripts", "haplotype-transcripts"):
        metrics = results[model]
        assert metrics["spearman_expressed"] > 0.88, (model, metrics)
        assert metrics["mard_expressed"] < 0.4, (model, metrics)
        assert metrics["false_mass"] < 0.02, (model, metrics)
        assert metrics["detected_frac"] > 0.8, (model, metrics)
        assert metrics["total_est"] > 0.95 * metrics["total_true"], (model, metrics)


def test_gene_panel_haplotype_model_beats_transcripts_on_false_mass():
    """On the gene-structured panel (real multimapping) with one
    diplotype per gene, the haplotype-aware nested model must place
    less mass on unexpressed haplotypes than the plain transcripts
    model — the reference paper's core claim, reproduced under the
    FULL realism regime: quality-driven sequencing errors,
    quality-adjusted scoring, and mpmap-shaped multipath DAGs with
    scored allele alternatives."""
    results = evaluate(
        num_pairs=12000, num_transcripts=420, seed=11,
        with_errors=True, score_not_qual=False, gene_panel=True,
        multipath_dag=True,
    )
    nested = results["haplotype-transcripts"]
    plain = results["transcripts"]
    assert nested["false_mass"] < plain["false_mass"], (nested, plain)
    assert nested["spearman_expressed"] > 0.8, nested
