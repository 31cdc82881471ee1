"""Cross-engine statistical equivalence of the Gibbs samplers.

The CPU speed path samples with C++ mt19937 streams while the device
path samples with counter-based threefry — draws differ bitwise by
construction, so the contract is DISTRIBUTIONAL equivalence
(COMPONENTS.md).  These tests pin that claim with moment bounds and
Kolmogorov-Smirnov tests at fixed seeds (both samplers are
deterministic given the seed, so the assertions are reproducible, not
flaky).
"""

import os

import numpy as np
import pytest


def _native_available():
    try:
        from rpvg_tpu.native import native_available

        return native_available()
    except Exception:
        return False


@pytest.fixture
def cluster():
    rng = np.random.default_rng(21)
    R, P = 60, 6
    probs = rng.random((R, P + 1)) * 0.5
    probs /= probs.sum(axis=1, keepdims=True)
    counts = rng.integers(1, 12, size=R).astype(np.float64)
    return probs, counts


def test_readcount_gibbs_native_vs_jax_distributional(cluster):
    """Read-count Gibbs: mt19937 (C++) and threefry (JAX) samplers must
    agree in distribution — per-path means within combined standard
    error and two-sample KS not rejecting at alpha=1e-3."""
    if not _native_available():
        pytest.skip("native toolchain unavailable")
    from scipy.stats import ks_2samp

    from rpvg_tpu.infer import readcount_gibbs as rg

    probs, counts = cluster
    total = float(counts.sum())
    P = probs.shape[1] - 1
    abundances = np.full(P, total / P)
    # Heavy thinning decorrelates the chain draws so the iid-assuming
    # KS test is valid.
    num_samples, thin = 400, 50

    import jax

    key = np.asarray(jax.random.PRNGKey(77))

    saved = os.environ.get("RPVG_TPU_NATIVE_EM")
    try:
        os.environ["RPVG_TPU_NATIVE_EM"] = "1"
        assert rg._native_gibbs_enabled()
        noise_n, paths_n = rg.gibbs_read_count_samples(
            probs, counts, abundances, 1.0, total, key, num_samples, thin
        )
        os.environ["RPVG_TPU_NATIVE_EM"] = "0"
        noise_j, paths_j = rg.gibbs_read_count_samples(
            probs, counts, abundances, 1.0, total, key, num_samples, thin
        )
    finally:
        if saved is None:
            os.environ.pop("RPVG_TPU_NATIVE_EM", None)
        else:
            os.environ["RPVG_TPU_NATIVE_EM"] = saved

    assert paths_n.shape == paths_j.shape == (num_samples, P)
    for arr_n, arr_j in [(noise_n, noise_j)] + [
        (paths_n[:, p], paths_j[:, p]) for p in range(P)
    ]:
        se = np.sqrt(arr_n.var() / len(arr_n) + arr_j.var() / len(arr_j))
        assert abs(arr_n.mean() - arr_j.mean()) < max(6 * se, 1e-6 * total), (
            arr_n.mean(),
            arr_j.mean(),
            se,
        )
        assert ks_2samp(arr_n, arr_j).pvalue > 1e-3


def test_posterior_gibbs_native_vs_jax_distributional(cluster):
    """Diploid collapsed-Gibbs posteriors: the mt19937 chains and the
    threefry chains must put the same mass on the same groups (total
    variation distance bound at fixed seeds)."""
    if not _native_available():
        pytest.skip("native toolchain unavailable")
    import jax

    from rpvg_tpu.infer import posteriors as post

    probs_full, counts = cluster
    probs = probs_full[:, :-1]
    noise = probs_full[:, -1]
    path_counts = [1] * probs.shape[1]
    key = np.asarray(jax.random.PRNGKey(33))

    saved = os.environ.get("RPVG_TPU_NATIVE_EM")
    try:
        os.environ["RPVG_TPU_NATIVE_EM"] = "1"
        native = post._posterior_gibbs_native(
            [(probs, noise, counts, path_counts)], [key]
        )
        assert native is not None, "native posterior sampler unavailable"
        groups_n, post_n = native[0]
        os.environ["RPVG_TPU_NATIVE_EM"] = "0"
        groups_j, post_j = post.path_group_posteriors_gibbs(
            probs, noise, counts, path_counts, 2, jax.numpy.asarray(key)
        )
    finally:
        if saved is None:
            os.environ.pop("RPVG_TPU_NATIVE_EM", None)
        else:
            os.environ["RPVG_TPU_NATIVE_EM"] = saved

    dist_n = {tuple(g): p for g, p in zip(groups_n, post_n)}
    dist_j = {tuple(g): p for g, p in zip(groups_j, post_j)}
    support = set(dist_n) | set(dist_j)
    tv = 0.5 * sum(
        abs(dist_n.get(g, 0.0) - dist_j.get(g, 0.0)) for g in support
    )
    assert tv < 0.05, f"total variation {tv:.4f} between samplers"
    # The dominant group must agree.
    assert max(dist_n, key=dist_n.get) == max(dist_j, key=dist_j.get)
