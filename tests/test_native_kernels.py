"""Differential tests for the CPU-native speed-path kernels against
their XLA / numpy reference implementations."""

import numpy as np
import pytest

from rpvg_tpu.infer import matrices as M
from rpvg_tpu.infer import posteriors as post
from rpvg_tpu.infer.batching import native_em_available, run_native_em, run_batched_em


pytestmark = pytest.mark.skipif(
    not native_em_available(), reason="native library unavailable"
)


def _random_cluster(rng, R, C):
    probs = rng.random((R, C))
    probs /= probs.sum(axis=1, keepdims=True)
    counts = rng.integers(1, 9, R).astype(float)
    return probs, counts


def test_native_em_matches_xla():
    rng = np.random.default_rng(5)
    inputs = [_random_cluster(rng, R, C) for R, C in [(3, 2), (10, 5), (40, 9), (7, 3)]]

    native = run_native_em(inputs, 10000, 0.001)

    import os

    os.environ["RPVG_TPU_NATIVE_EM"] = "0"
    try:
        xla = run_batched_em(inputs, 10000, 0.001)
    finally:
        os.environ.pop("RPVG_TPU_NATIVE_EM")

    for (n_counts, n_noise), (x_counts, x_noise) in zip(native, xla):
        np.testing.assert_allclose(n_counts, x_counts, rtol=1e-6, atol=1e-9)
        assert n_noise == pytest.approx(x_noise, rel=1e-6, abs=1e-9)


def test_native_em_batch_equals_per_cluster():
    # Ragged batching is thread distribution only: bitwise identical to
    # one-cluster calls.
    rng = np.random.default_rng(6)
    inputs = [_random_cluster(rng, R, C) for R, C in [(5, 4), (20, 7), (3, 2)]]
    batched = run_native_em(inputs, 10000, 0.001)
    for item, (b_counts, b_noise) in zip(inputs, batched):
        [(s_counts, s_noise)] = run_native_em([item], 10000, 0.001)
        np.testing.assert_array_equal(b_counts, s_counts)
        assert b_noise == s_noise


def test_native_diploid_scores_match_xla():
    rng = np.random.default_rng(7)
    inputs = []
    for R, P in [(6, 3), (15, 5), (30, 8)]:
        probs = rng.random((R, P)) * 0.5
        noise = rng.random(R) * 0.2 + 0.01
        counts = rng.integers(1, 8, R).astype(float)
        inputs.append((probs, noise, counts, rng.integers(1, 4, P).tolist()))

    native = post._diploid_posteriors_native(inputs, 1e-8)
    assert native is not None
    for (probs, noise, counts, pc), (n_groups, n_post) in zip(inputs, native):
        x_groups, x_post = post.path_group_posteriors_diploid(
            probs, noise, counts, pc, 1e-8
        )
        assert n_groups == x_groups
        np.testing.assert_allclose(n_post, x_post, rtol=1e-9, atol=1e-12)


def test_native_subset_collapse_matches_numpy():
    rng = np.random.default_rng(8)
    R, C = 12, 9
    dense = rng.random((R, C))
    dense[rng.random((R, C)) < 0.5] = 0.0
    # Duplicate rows so the collapse has work to do.
    dense[5] = dense[2]
    dense[9] = dense[2]
    noise = rng.random(R) * 0.3
    counts = rng.integers(1, 5, R).astype(float)

    specs = [
        [[0], [3], [7]],              # gather
        [[0, 1, 2], [4, 5], [8]],     # group sums
    ]
    native = M.native_subset_collapse(dense, noise, counts, specs, 1e-8)
    assert native is not None
    for spec, (n_full, n_counts) in zip(specs, native):
        cols = np.empty((R, len(spec)))
        for oc, src in enumerate(spec):
            cols[:, oc] = dense[:, src].sum(axis=1)
        full = M.add_noise_and_normalize(cols, noise)
        full, cnt = M.read_collapse(full, counts, 1e-8)
        np.testing.assert_array_equal(n_full, full)
        np.testing.assert_array_equal(n_counts, cnt)
