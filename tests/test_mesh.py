"""Device-mesh tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_graft_entry_compiles():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 16)


def test_dryrun_multichip_8():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sharded_em_matches_unsharded():
    from rpvg_tpu.infer.em import em_abundances_batched
    from rpvg_tpu.parallel.mesh import make_mesh, sharded_em_step

    rng = np.random.default_rng(5)
    B, R, C = 16, 32, 8
    probs = rng.random((B, R, C))
    probs /= probs.sum(axis=2, keepdims=True)
    counts = rng.integers(1, 10, size=(B, R)).astype(np.float64)
    col_masks = np.ones((B, C))
    inv_eff = np.full((B, C - 1), 1.0 / 50.0)

    mesh = make_mesh(8)
    step = sharded_em_step(mesh, max_em_its=300)
    sharded_abund, tpm = step(
        jnp.asarray(probs), jnp.asarray(counts), jnp.asarray(col_masks), jnp.asarray(inv_eff)
    )

    local_abund, _ = em_abundances_batched(probs, counts, col_masks, 300, 0.001)
    assert np.allclose(np.asarray(sharded_abund), local_abund, rtol=1e-8, atol=1e-10)

    totals = counts.sum(axis=1)
    expected_tpm = (local_abund[:, :-1] * totals[:, None] * inv_eff).sum()
    assert float(tpm) == pytest.approx(expected_tpm, rel=1e-8)


def test_psum_histogram():
    from rpvg_tpu.parallel.mesh import make_mesh, psum_histogram

    mesh = make_mesh(8)
    local = np.arange(8 * 16, dtype=np.float32).reshape(8, 16)
    reduced = np.asarray(psum_histogram(mesh)(jnp.asarray(local)))
    assert np.allclose(reduced, local.sum(axis=0))


def test_sharded_giant_cluster_scores_match_dense():
    # Giant clusters route through the model-axis sharded scorer when
    # the pair tensor exceeds one device but fits across the mesh.
    import numpy as np

    from rpvg_tpu.infer import posteriors as post

    rng = np.random.default_rng(11)
    R, P = 16, 24
    probs = rng.random((R, P)) * 0.4
    noise = rng.random(R) * 0.1 + 0.01
    counts = rng.integers(1, 8, size=R).astype(float)
    path_counts = [1] * P

    dense_groups, dense_post = post.path_group_posteriors_diploid(
        probs, noise, counts, path_counts, 1e-300
    )

    # R*P*P = 9216: above the per-device limit, within limit * 8 devices.
    saved = post._PAIR_TENSOR_ELEMENT_LIMIT
    post._PAIR_TENSOR_ELEMENT_LIMIT = 2048
    try:
        log_freqs = np.log(np.asarray(path_counts) / float(sum(path_counts)))
        assert post._pair_scores_sharded(probs, noise, counts, log_freqs) is not None
        sharded_groups, sharded_post = post.path_group_posteriors_diploid(
            probs, noise, counts, path_counts, 1e-300
        )
    finally:
        post._PAIR_TENSOR_ELEMENT_LIMIT = saved

    assert sharded_groups == dense_groups
    assert np.allclose(sharded_post, dense_post, rtol=1e-9, atol=1e-12)


def test_autoshard_batched_em_byte_identical():
    # The production batched-EM dispatch shards its (B, ...) stacks over
    # the data mesh via shard_batched; per-cluster math never crosses
    # the batch axis, so sharded and unsharded runs must be bitwise
    # identical.
    import os

    from rpvg_tpu.infer.em import em_abundances_batched
    from rpvg_tpu.parallel import autoshard

    rng = np.random.default_rng(17)
    B, R, C = 16, 32, 8
    probs = rng.random((B, R, C))
    probs /= probs.sum(axis=2, keepdims=True)
    counts = rng.integers(1, 10, size=(B, R)).astype(np.float64)
    col_masks = np.ones((B, C))

    assert autoshard.data_mesh() is not None  # 8-device CPU mesh active
    assert autoshard.num_data_shards() == 8
    sharded_abund, sharded_its = em_abundances_batched(
        probs, counts, col_masks, 300, 0.001
    )

    os.environ["RPVG_TPU_AUTOSHARD"] = "0"
    autoshard.data_mesh.cache_clear()
    try:
        assert autoshard.data_mesh() is None
        plain_abund, plain_its = em_abundances_batched(
            probs, counts, col_masks, 300, 0.001
        )
    finally:
        del os.environ["RPVG_TPU_AUTOSHARD"]
        autoshard.data_mesh.cache_clear()

    assert np.array_equal(np.asarray(sharded_abund), np.asarray(plain_abund))
    assert np.array_equal(np.asarray(sharded_its), np.asarray(plain_its))


def test_shard_batched_indivisible_passthrough():
    from rpvg_tpu.parallel import autoshard

    a = np.ones((6, 4))  # 6 % 8 != 0 -> stays unsharded
    out = autoshard.shard_batched(a)
    assert out is a
