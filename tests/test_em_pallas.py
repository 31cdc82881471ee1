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


def test_pallas_fused_matches_per_block():
    """The fused multi-bucket kernel (one launch, one shared fixed-point
    loop over differently-shaped blocks) must reproduce the per-block
    kernel exactly: per-cluster convergence freezing makes each
    cluster's trajectory independent of its launchmates."""
    from rpvg_tpu.ops.em_pallas import em_pallas_fused

    rng = np.random.default_rng(11)
    blocks = []
    for B, R, C in ((4, 16, 8), (2, 32, 16), (8, 8, 8)):
        probs = rng.random((B, R, C)).astype(np.float32)
        probs /= probs.sum(axis=2, keepdims=True)
        counts = rng.integers(1, 20, size=(B, R)).astype(np.float32)
        masks = np.ones((B, C), dtype=np.float32)
        # Ragged padding inside the first block.
        masks[0, C // 2 :] = 0.0
        probs[0, :, C // 2 :] = 0.0
        blocks.append((probs, counts, masks))

    fused = em_pallas_fused(blocks, 500, 0.001, interpret=True)
    for (probs, counts, masks), out in zip(blocks, fused):
        single = np.asarray(
            em_pallas_batched(probs, counts, masks, 500, 0.001, interpret=True)
        )
        np.testing.assert_allclose(np.asarray(out), single, rtol=1e-5, atol=1e-7)
        xla, _ = em_abundances_batched(probs, counts, masks, 500, 0.001)
        assert np.allclose(np.asarray(out), xla, rtol=1e-4, atol=1e-6)


def test_dispatch_fuses_small_buckets(monkeypatch):
    """dispatch_em_device with Pallas forced on must group the small
    shape buckets into fused launches and still match the XLA dispatch
    (interpret-mode kernels stand in for the TPU compile)."""
    from rpvg_tpu.infer import batching
    from rpvg_tpu.ops import em_pallas

    calls = {"fused_blocks": [], "single": 0}
    orig_fused = em_pallas.em_pallas_fused
    orig_single = em_pallas.em_pallas_batched

    def fused(blocks, its, conv):
        calls["fused_blocks"].append(len(blocks))
        return orig_fused(blocks, its, conv, interpret=True)

    def single(p, c, m, its, conv):
        calls["single"] += 1
        return orig_single(p, c, m, its, conv, interpret=True)

    monkeypatch.setattr(em_pallas, "em_pallas_fused", fused)
    monkeypatch.setattr(em_pallas, "em_pallas_batched", single)
    # The auto policy only fuses when the measured link's dispatch cost
    # warrants it (no accelerator in CI) — force it on for the test.
    monkeypatch.setenv("RPVG_TPU_FUSE_EM", "1")

    rng = np.random.default_rng(5)
    cluster_inputs = []
    for _ in range(12):
        R = int(rng.integers(4, 60))
        C = int(rng.integers(3, 24))
        p = rng.random((R, C))
        p /= p.sum(axis=1, keepdims=True)
        cluster_inputs.append(
            (p.astype(np.float64), rng.integers(1, 9, R).astype(np.float64))
        )

    idx = list(range(len(cluster_inputs)))
    pending = batching.dispatch_em_device(
        cluster_inputs, idx, 500, 0.001, use_pallas="on"
    )
    results = [None] * len(idx)
    batching.gather_em_device(pending, cluster_inputs, results)
    assert any(n >= 2 for n in calls["fused_blocks"]), calls

    pending_x = batching.dispatch_em_device(
        cluster_inputs, idx, 500, 0.001, use_pallas="off"
    )
    results_x = [None] * len(idx)
    batching.gather_em_device(pending_x, cluster_inputs, results_x)
    for (got_counts, got_noise), (want_counts, want_noise) in zip(
        results, results_x
    ):
        np.testing.assert_allclose(got_counts, want_counts, rtol=1e-3, atol=1e-5)
        assert got_noise == pytest.approx(want_noise, rel=1e-3, abs=1e-5)


def test_pallas_ragged_batch_covers_tail():
    """A batch size that is not a multiple of the auto-chosen VMEM
    chunk must still compute EVERY cluster (the grid previously
    truncated at B//G and returned uninitialized output for the
    tail)."""
    rng = np.random.default_rng(9)
    B, R, C = 6, 16, 8
    probs = rng.random((B, R, C)).astype(np.float32)
    probs /= probs.sum(axis=2, keepdims=True)
    counts = rng.integers(1, 20, size=(B, R)).astype(np.float32)
    masks = np.ones((B, C), dtype=np.float32)
    xla, _ = em_abundances_batched(probs, counts, masks, 300, 0.001)
    pallas = np.asarray(
        em_pallas_batched(probs, counts, masks, 300, 0.001, interpret=True)
    )
    assert pallas.shape == (B, C)
    assert np.allclose(pallas, xla, rtol=1e-4, atol=1e-6)
