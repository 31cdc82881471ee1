"""Pallas EM kernel vs the XLA batched reference implementation
(interpret mode on CPU; the compiled path runs on TPU)."""

import numpy as np
import pytest

from rpvg_tpu.infer.em import em_abundances_batched
from rpvg_tpu.ops.em_pallas import em_pallas_batched


def test_pallas_em_matches_xla():
    rng = np.random.default_rng(3)
    B, R, C = 4, 16, 8
    probs = rng.random((B, R, C)).astype(np.float32)
    probs /= probs.sum(axis=2, keepdims=True)
    counts = rng.integers(1, 20, size=(B, R)).astype(np.float32)
    col_masks = np.ones((B, C), dtype=np.float32)
    # Mask some tail columns/rows to exercise padding behaviour.
    col_masks[1, 5:] = 0.0
    probs[1, :, 5:] = 0.0
    counts[2, 10:] = 0.0
    probs[2, 10:, :] = 0.0

    xla, _ = em_abundances_batched(probs, counts, col_masks, 500, 0.001)
    pallas = np.asarray(
        em_pallas_batched(probs, counts, col_masks, 500, 0.001, interpret=True)
    )
    assert np.allclose(pallas, xla, rtol=1e-4, atol=1e-6)
