"""Inference-layer tests: EM fixed points, posterior engines, minimum
path cover (reference oracle), Gibbs samplers (statistical), and the
four model estimators end-to-end on synthetic clusters."""

import math

import jax
import numpy as np
import pytest

from rpvg_tpu.infer.em import em_abundances, em_abundances_batched
from rpvg_tpu.infer.estimates import PathClusterEstimates
from rpvg_tpu.infer.estimators import (
    ClusterRNG,
    MinimumPathAbundanceEstimator,
    NestedPathAbundanceEstimator,
    PathAbundanceEstimator,
    PathGroupPosteriorEstimator,
    PathPosteriorEstimator,
)
from rpvg_tpu.infer.matrices import (
    add_noise_and_normalize,
    construct_probability_matrix,
    read_collapse,
)
from rpvg_tpu.infer.mincover import weighted_minimum_path_cover
from rpvg_tpu.infer.posteriors import (
    path_group_posteriors_diploid,
    path_group_posteriors_full,
    path_group_posteriors_gibbs,
)
from rpvg_tpu.probabilities import PathInfo, ReadPathProbs


def make_rpp(read_count, noise_prob, path_probs):
    rpp = ReadPathProbs(read_count, 1e-8)
    rpp.noise_prob = noise_prob
    rpp.path_probs = [(p, list(ids)) for p, ids in path_probs]
    return rpp


# --------------------------------------------------------------------- EM


def test_em_single_path_takes_all():
    # All reads favour path 0: the EM fixed point drives its abundance
    # to the full read mass and the noise column to zero.
    probs = np.array([[0.9, 0.1], [0.9, 0.1]])
    counts = np.array([2.0, 3.0])
    abundances, noise_count = em_abundances(probs, counts, 5.0)
    assert abundances[0] == pytest.approx(5.0, rel=1e-2)
    assert noise_count == pytest.approx(0.0, abs=0.1)
    assert abundances[0] + noise_count == pytest.approx(5.0, rel=1e-9)


def test_em_split_paths():
    # Reads uniquely on each of two paths plus shared reads: EM splits
    # shared mass according to unique evidence.
    probs = np.array(
        [
            [0.5, 0.0, 0.5, 0.0],
            [0.0, 0.5, 0.5, 0.0],
            [0.25, 0.25, 0.5, 0.0],
        ]
    )
    counts = np.array([10.0, 10.0, 10.0])
    abundances, noise_count = em_abundances(probs, counts, 30.0)
    assert noise_count == pytest.approx(0.0, abs=1e-6)
    assert abundances.sum() == pytest.approx(30.0, rel=1e-9)
    # Path 2 (shared) collects more than either unique path.
    assert abundances[2] > abundances[0]
    assert abundances[0] == pytest.approx(abundances[1], rel=1e-6)


def test_em_batched_matches_single():
    rng = np.random.default_rng(0)
    mats, cnts = [], []
    shapes = [(5, 3), (7, 4), (3, 2)]
    R, C = 8, 5
    batch_probs = np.zeros((len(shapes), R, C))
    batch_counts = np.zeros((len(shapes), R))
    col_masks = np.zeros((len(shapes), C))
    singles = []
    for b, (r, c) in enumerate(shapes):
        m = rng.random((r, c))
        m = m / m.sum(axis=1, keepdims=True)
        n = rng.integers(1, 20, size=r).astype(float)
        batch_probs[b, :r, :c] = m
        batch_counts[b, :r] = n
        col_masks[b, :c] = 1.0
        singles.append(em_abundances(m, n, float(n.sum())))

    batched, _ = em_abundances_batched(batch_probs, batch_counts, col_masks)
    for b, (r, c) in enumerate(shapes):
        total = batch_counts[b].sum()
        got = batched[b, :c] * total
        want = np.concatenate([singles[b][0], [singles[b][1]]])
        assert got.sum() == pytest.approx(total, rel=1e-9)
        assert np.allclose(got[:-1][got[:-1] >= 1e-8 * total], want[:-1][want[:-1] > 0], rtol=1e-6)


# -------------------------------------------------------------- posteriors


def test_marginal_posteriors_sum_to_one():
    probs = np.array([[0.8, 0.1], [0.1, 0.8]])
    noise = np.array([0.1, 0.1])
    counts = np.array([5.0, 1.0])
    groups, posteriors = path_group_posteriors_full(probs, noise, counts, [1, 1], 1)
    assert groups == [[0], [1]]
    assert posteriors.sum() == pytest.approx(1.0)
    assert posteriors[0] > posteriors[1]


def test_full_vs_manual_diploid():
    probs = np.array([[0.8, 0.1], [0.1, 0.6]])
    noise = np.array([0.05, 0.1])
    counts = np.array([3.0, 2.0])
    groups, posteriors = path_group_posteriors_full(probs, noise, counts, [1, 1], 2)
    assert groups == [[0, 0], [0, 1], [1, 1]]

    # Manual computation per reference formulas.
    log_freqs = np.log(np.array([0.5, 0.5]))
    lls = []
    for g, perm in zip(groups, [1, 2, 1]):
        gp = noise + probs[:, g].sum(axis=1) / 2
        lls.append(counts @ np.log(gp) + log_freqs[g].sum() + math.log(perm))
    lls = np.array(lls)
    expected = np.exp(lls - lls.max())
    expected /= expected.sum()
    assert np.allclose(posteriors, expected, rtol=1e-9)


def test_diploid_dense_matches_full():
    rng = np.random.default_rng(1)
    R, P = 20, 6
    probs = rng.random((R, P)) * 0.5
    noise = rng.random(R) * 0.2 + 0.01
    counts = rng.integers(1, 10, size=R).astype(float)
    path_counts = rng.integers(1, 4, size=P).tolist()

    groups_full, post_full = path_group_posteriors_full(probs, noise, counts, path_counts, 2)
    groups_dip, post_dip = path_group_posteriors_diploid(
        probs, noise, counts, path_counts, 1e-300
    )
    assert groups_dip == groups_full
    assert np.allclose(post_dip, post_full, rtol=1e-6, atol=1e-12)


def test_diploid_threshold_drops_tail():
    probs = np.array([[0.9, 1e-8, 1e-8]] * 10)
    noise = np.full(10, 0.01)
    counts = np.full(10, 5.0)
    groups, posteriors = path_group_posteriors_diploid(probs, noise, counts, [1, 1, 1], 1e-4)
    # Pairs not containing path 0 are dropped.
    assert all(0 in g for g in groups)
    assert posteriors.sum() == pytest.approx(1.0)


def test_gibbs_posteriors_match_full_distributionally():
    probs = np.array(
        [
            [0.9, 0.05, 0.0],
            [0.9, 0.0, 0.05],
            [0.0, 0.45, 0.45],
        ]
    )
    noise = np.full(3, 0.05)
    counts = np.array([10.0, 10.0, 5.0])
    groups_full, post_full = path_group_posteriors_full(probs, noise, counts, [1, 1, 1], 2)
    groups_gibbs, post_gibbs = path_group_posteriors_gibbs(
        probs, noise, counts, [1, 1, 1], 2, jax.random.PRNGKey(7)
    )
    full_map = {tuple(g): p for g, p in zip(groups_full, post_full)}
    for g, p in zip(groups_gibbs, post_gibbs):
        assert abs(full_map[tuple(g)] - p) < 0.05


# ---------------------------------------------------------------- mincover


def test_weighted_minimum_path_cover():
    # Oracle: reference "Weighted minimum path cover can be found"
    # (/root/reference/src/tests/path_abundance_estimator_test.cpp:8-28).
    cover = np.array([[1, 0, 1], [0, 1, 0], [1, 0, 0], [0, 1, 1]], dtype=bool)
    counts = np.array([1.0, 3.0, 1.0, 5.0])
    weights = np.array([1.0, 1.0, 1.0])
    assert weighted_minimum_path_cover(cover, counts, weights) == [0, 1]

    weights[2] = 0.01
    assert weighted_minimum_path_cover(cover, counts, weights) == [0, 1, 2]


# -------------------------------------------------------------- estimators


def make_cluster(paths_spec, rpps):
    est = PathClusterEstimates()
    est.paths = [
        PathInfo(
            name=name,
            group_id=group,
            source_count=src,
            source_ids=frozenset(srcs),
            length=length,
            effective_length=eff,
        )
        for name, group, src, srcs, length, eff in paths_spec
    ]
    return est, rpps


def test_transcripts_estimator():
    est, rpps = make_cluster(
        [("t1", 0, 1, [0], 100, 80.0), ("t2", 1, 1, [1], 100, 80.0)],
        [
            make_rpp(10, 0.01, [(0.99, [0])]),
            make_rpp(5, 0.01, [(0.495, [0, 1])]),
            make_rpp(10, 0.01, [(0.99, [1])]),
        ],
    )
    PathAbundanceEstimator().estimate(est, rpps, ClusterRNG(42, 0))
    assert est.total_count == 25.0
    assert sum(est.abundances) + est.noise_count == pytest.approx(25.0, rel=1e-9)
    assert est.abundances[0] == pytest.approx(est.abundances[1], rel=1e-6)


def test_haplotypes_estimator_diploid():
    est, rpps = make_cluster(
        [("h1", 0, 1, [0], 100, 80.0), ("h2", 1, 1, [1], 100, 80.0)],
        [
            make_rpp(10, 0.01, [(0.99, [0])]),
            make_rpp(10, 0.01, [(0.99, [1])]),
        ],
    )
    PathGroupPosteriorEstimator(2, False).estimate(est, rpps, ClusterRNG(42, 0))
    by_set = {tuple(g): p for g, p in zip(est.path_group_sets, est.posteriors)}
    # Heterozygous diplotype dominates.
    assert by_set[(0, 1)] > 0.9


def test_strains_estimator():
    est, rpps = make_cluster(
        [("s1", 0, 1, [0], 100, 80.0), ("s2", 1, 1, [1], 100, 80.0)],
        [
            make_rpp(20, 0.01, [(0.99, [0])]),
            make_rpp(1, 0.01, [(0.495, [0, 1])]),
        ],
    )
    MinimumPathAbundanceEstimator().estimate(est, rpps, ClusterRNG(42, 0))
    # Path 0 covers everything; path 1 gets nothing.
    assert est.abundances[0] > 20.0
    assert est.abundances[1] == 0.0


def test_nested_estimator_collapsed():
    # Two haplotypes of one transcript group; reads favour haplotype 0.
    est, rpps = make_cluster(
        [
            ("t1_h0", 0, 1, [0], 100, 80.0),
            ("t1_h1", 0, 1, [1], 100, 80.0),
        ],
        [
            make_rpp(20, 0.01, [(0.99, [0])]),
            make_rpp(1, 0.01, [(0.495, [0, 1])]),
        ],
    )
    estimator = NestedPathAbundanceEstimator(
        group_size=2, min_hap_prob=0.001, infer_collapsed=True, use_group_post_gibbs=False
    )
    estimator.estimate(est, rpps, ClusterRNG(42, 0))
    assert est.total_count == 21.0
    total_abundance = sum(est.abundances) + est.noise_count
    assert total_abundance == pytest.approx(21.0, rel=1e-6)
    # Haplotype 0 should dominate the abundance.
    path0_abundance = 0.0
    idx = 0
    for group_set in est.path_group_sets:
        for pid in group_set:
            if pid == 0:
                path0_abundance += est.abundances[idx]
            idx += 1
    assert path0_abundance > 15.0


def test_nested_estimator_independent():
    est, rpps = make_cluster(
        [
            ("t1_h0", 0, 1, [0], 100, 80.0),
            ("t1_h1", 0, 1, [1], 100, 80.0),
        ],
        [
            make_rpp(20, 0.01, [(0.99, [0])]),
            make_rpp(1, 0.01, [(0.495, [0, 1])]),
        ],
    )
    estimator = NestedPathAbundanceEstimator(
        group_size=2, min_hap_prob=0.01, infer_collapsed=False, use_group_post_gibbs=False
    )
    estimator.estimate(est, rpps, ClusterRNG(42, 0))
    assert sum(est.abundances) + est.noise_count == pytest.approx(21.0, rel=1e-6)


def test_gibbs_read_count_sampler_statistics():
    est, rpps = make_cluster(
        [("t1", 0, 1, [0], 100, 80.0), ("t2", 1, 1, [1], 100, 80.0)],
        [
            make_rpp(50, 0.01, [(0.99, [0])]),
            make_rpp(50, 0.01, [(0.99, [1])]),
        ],
    )
    PathAbundanceEstimator(num_gibbs_samples=50, gibbs_thin_its=5).estimate(
        est, rpps, ClusterRNG(42, 0)
    )
    assert len(est.gibbs_read_count_samples) == 1
    samples = est.gibbs_read_count_samples[0]
    arr = np.array(samples.abundance_samples).reshape(50, 2)
    # Posterior means near the EM point estimates.
    assert abs(arr[:, 0].mean() - est.abundances[0]) < 10.0
    assert abs(arr[:, 1].mean() - est.abundances[1]) < 10.0


def test_posterior_estimator_marginal():
    est, rpps = make_cluster(
        [("h1", 0, 1, [0], 100, 80.0), ("h2", 1, 1, [1], 100, 80.0)],
        [make_rpp(10, 0.01, [(0.99, [0])])],
    )
    PathPosteriorEstimator().estimate(est, rpps, ClusterRNG(42, 0))
    assert est.path_group_sets == [[0], [1]]
    assert est.posteriors[0] > 0.99


def test_diploid_blocked_matches_dense():
    # Force the blocked column path and compare against the dense kernel.
    from rpvg_tpu.infer import posteriors as post

    rng = np.random.default_rng(9)
    R, P = 16, 24
    probs = rng.random((R, P)) * 0.4
    noise = rng.random(R) * 0.1 + 0.01
    counts = rng.integers(1, 8, size=R).astype(float)
    path_counts = [1] * P

    dense_groups, dense_post = post.path_group_posteriors_diploid(
        probs, noise, counts, path_counts, 1e-300
    )

    saved = post._PAIR_TENSOR_ELEMENT_LIMIT
    post._PAIR_TENSOR_ELEMENT_LIMIT = 64  # force blocking
    try:
        blocked_groups, blocked_post = post.path_group_posteriors_diploid(
            probs, noise, counts, path_counts, 1e-300
        )
    finally:
        post._PAIR_TENSOR_ELEMENT_LIMIT = saved

    assert blocked_groups == dense_groups
    assert np.allclose(blocked_post, dense_post, rtol=1e-9, atol=1e-12)


def test_batched_strains_matches_per_cluster():
    # The batched strains driver must reproduce the per-cluster
    # estimator exactly (same cover, same EM results).
    from rpvg_tpu.infer.batched_models import batched_strains, supports_batched_strains

    rng = np.random.default_rng(7)
    specs = []
    for n_paths, n_reads in [(1, 3), (2, 5), (4, 12), (7, 30), (3, 1), (5, 0)]:
        paths_spec = [
            (f"p{j}", j, 1, [j], 100 + 10 * j, 80.0 + 5.0 * j) for j in range(n_paths)
        ]
        rpps = []
        for _ in range(n_reads):
            k = int(rng.integers(1, n_paths + 1))
            ids = sorted(rng.choice(n_paths, size=k, replace=False).tolist())
            prob = float(rng.uniform(0.3, 0.99)) / k
            rpps.append(
                make_rpp(int(rng.integers(1, 6)), float(rng.uniform(0.001, 0.2)), [(prob, ids)])
            )
        specs.append((paths_spec, rpps))

    estimator = MinimumPathAbundanceEstimator()
    assert supports_batched_strains(estimator, 0)
    assert supports_batched_strains(estimator, 10)

    serial = []
    for paths_spec, rpps in specs:
        est, _ = make_cluster(paths_spec, rpps)
        estimator.estimate(est, rpps, ClusterRNG(42, 0))
        serial.append(est)

    batch_data = []
    for paths_spec, rpps in specs:
        est, _ = make_cluster(paths_spec, rpps)
        batch_data.append((est, rpps))
    batched_strains(estimator, batch_data)

    for ser, (bat, _) in zip(serial, batch_data):
        assert bat.abundances == pytest.approx(ser.abundances, rel=1e-9, abs=1e-12)
        assert bat.noise_count == pytest.approx(ser.noise_count, rel=1e-9, abs=1e-12)
        assert bat.total_count == ser.total_count


def test_batched_transcripts_gibbs_distributional():
    # The batched Gibbs sweep matches the per-cluster dispatch bitwise
    # at equal dtype (threefry is counter-based, so padded draws share
    # their prefix with unpadded draws); on CPU/f64 we assert exactly.
    from rpvg_tpu.infer.batched_models import (
        batched_transcripts,
        supports_batched_transcripts,
    )
    from rpvg_tpu.infer.estimators import PathAbundanceEstimator

    def make_data():
        specs = [
            [
                ("t1", 0, 1, [0], 100, 80.0),
                ("t2", 1, 1, [1], 100, 80.0),
            ],
            [
                ("t3", 0, 1, [0], 120, 95.0),
            ],
        ]
        rpp_sets = [
            [
                make_rpp(40, 0.01, [(0.99, [0])]),
                make_rpp(10, 0.01, [(0.495, [0, 1])]),
                make_rpp(20, 0.01, [(0.99, [1])]),
            ],
            [make_rpp(30, 0.02, [(0.98, [0])])],
        ]
        return [make_cluster(spec, rpps) for spec, rpps in zip(specs, rpp_sets)]

    estimator = PathAbundanceEstimator(num_gibbs_samples=200, gibbs_thin_its=3)
    assert supports_batched_transcripts(estimator)
    assert not supports_batched_transcripts(MinimumPathAbundanceEstimator())

    batch_data = make_data()
    batched_transcripts(estimator, batch_data, rng_seed=42)

    serial = make_data()
    for rank, (est, rpps) in enumerate(serial):
        estimator.estimate(est, rpps, ClusterRNG(42, rank))

    for (bat, _), (ser, _) in zip(batch_data, serial):
        assert bat.abundances == pytest.approx(ser.abundances, rel=1e-9, abs=1e-12)
        assert len(bat.gibbs_read_count_samples) == 1
        b, s = bat.gibbs_read_count_samples[0], ser.gibbs_read_count_samples[0]
        assert b.path_ids == s.path_ids
        # Bitwise sample parity (CPU runs both paths in float64).
        np.testing.assert_array_equal(
            np.asarray(b.abundance_samples), np.asarray(s.abundance_samples)
        )
        np.testing.assert_array_equal(
            np.asarray(b.noise_samples), np.asarray(s.noise_samples)
        )
        b_means = np.asarray(b.abundance_samples).reshape(200, -1).mean(axis=0)
        np.testing.assert_allclose(b_means, bat.abundances, rtol=0.35, atol=2.0)


def test_batched_posterior_gibbs_matches_unbatched():
    # Bucketed chains with padded chain/iteration counts must slice to
    # the exact draws of the per-cluster sampler (counter-based keys).
    from rpvg_tpu.infer.posteriors import (
        path_group_posteriors_gibbs_batched,
    )

    rng = np.random.default_rng(3)
    inputs = []
    keys = []
    for i, (R, P) in enumerate([(5, 3), (9, 4), (3, 3), (20, 6)]):
        probs = rng.random((R, P)) * 0.6
        noise = rng.random(R) * 0.2 + 0.01
        counts = rng.integers(1, 8, R).astype(float)
        path_counts = rng.integers(1, 4, P).tolist()
        inputs.append((probs, noise, counts, path_counts))
        keys.append(np.asarray(jax.random.PRNGKey(100 + i)))

    batched = path_group_posteriors_gibbs_batched(inputs, 2, keys)
    for (probs, noise, counts, path_counts), key, (groups_b, post_b) in zip(
        inputs, keys, batched
    ):
        groups_s, post_s = path_group_posteriors_gibbs(
            probs, noise, counts, path_counts, 2, jax.numpy.asarray(key)
        )
        assert groups_b == groups_s
        np.testing.assert_array_equal(post_b, post_s)


def test_full_posteriors_batched_matches_per_cluster():
    """Non-diploid full enumeration: the bucketed device engine must
    reproduce path_group_posteriors_full for every ploidy (including the
    reference's n!/(n-u+1)! permutation prior, src/utils.hpp:95-117)."""
    from rpvg_tpu.infer.posteriors import (
        full_posteriors_batched,
        path_group_posteriors_full,
    )

    rng = np.random.default_rng(3)
    for group_size in (1, 3, 4, 5):
        inputs = []
        for _ in range(9):
            R = int(rng.integers(2, 40))
            P = int(rng.integers(2, 12))
            probs = rng.random((R, P)) * 0.5
            noise = rng.random(R) * 0.1 + 1e-3
            counts = rng.integers(1, 9, size=R).astype(np.float64)
            path_counts = [int(c) for c in rng.integers(1, 4, size=P)]
            inputs.append((probs, noise, counts, path_counts))
        batched = full_posteriors_batched(inputs, group_size)
        for (probs, noise, counts, path_counts), (groups_b, post_b) in zip(
            inputs, batched
        ):
            groups_s, post_s = path_group_posteriors_full(
                probs, noise, counts, path_counts, group_size
            )
            assert groups_b == [list(g) for g in groups_s]
            np.testing.assert_allclose(post_b, post_s, rtol=1e-10, atol=1e-13)


def test_full_posteriors_batched_enumeration_fallback():
    """Clusters whose padded enumeration exceeds the group limit fall
    back to the per-cluster host engine inside the batched driver."""
    from rpvg_tpu.infer import posteriors as post

    rng = np.random.default_rng(7)
    probs = rng.random((6, 9)) * 0.5
    noise = rng.random(6) * 0.1 + 1e-3
    counts = rng.integers(1, 5, size=6).astype(np.float64)
    inputs = [(probs, noise, counts, [1] * 9)]

    saved = post._FULL_ENUM_GROUP_LIMIT
    post._FULL_ENUM_GROUP_LIMIT = 8  # force the fallback branch
    try:
        fallback = post.full_posteriors_batched(inputs, 3)
    finally:
        post._FULL_ENUM_GROUP_LIMIT = saved
    direct = post.path_group_posteriors_full(probs, noise, counts, [1] * 9, 3)
    assert fallback[0][0] == [list(g) for g in direct[0]]
    np.testing.assert_allclose(fallback[0][1], direct[1], rtol=1e-12)


def test_diploid_batched_giant_cluster_routing(monkeypatch):
    """Clusters whose padded (B, R, P, P) tensor overflows the
    pair-tensor guard route through the per-cluster blocked /
    model-axis-sharded path; results match the batched kernel."""
    from rpvg_tpu.infer.posteriors import diploid_posteriors_batched

    rng = np.random.default_rng(4)
    inputs = []
    for r, p in [(20, 6), (40, 10), (8, 4)]:
        probs = rng.random((r, p))
        noise = rng.random(r) * 0.05 + 0.01
        counts = rng.integers(1, 5, r).astype(float)
        inputs.append((probs, noise, counts, [1] * p))

    monkeypatch.setenv("RPVG_TPU_NATIVE_EM", "0")  # force the JAX path
    plain = diploid_posteriors_batched(inputs, 1e-8)
    # Limit 600: the (8, 4) cluster (padded 8*8*8=512) stays batched,
    # the two larger ones become "giant" and take the blocked path.
    monkeypatch.setenv("RPVG_TPU_PAIR_TENSOR_LIMIT", "600")
    routed = diploid_posteriors_batched(inputs, 1e-8)
    for (g_plain, p_plain), (g_routed, p_routed) in zip(plain, routed):
        assert g_plain == g_routed
        np.testing.assert_allclose(p_plain, p_routed, rtol=1e-9, atol=1e-12)
