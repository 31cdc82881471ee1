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
