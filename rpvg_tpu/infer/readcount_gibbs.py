"""Gibbs read-count sampler: posterior read-count allocations per path
via binomial thinning + Dirichlet(gamma) resampling (reference
gibbsReadCountSampler, /root/reference/src/path_abundance_estimator.cpp:116-212).

Expressed as a JAX scan: the per-row sequential binomial thinning over
columns is exactly a multinomial split, vectorised across all rows.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MIN_GIBBS_ABUNDANCE


def _multinomial_rows(key, n, p):
    """Sample row-wise multinomials by sequential binomial splitting.

    n: (R,) counts; p: (R, C) probabilities summing to <= 1 per row."""
    C = p.shape[1]

    def split(carry, inputs):
        remaining_n, remaining_p = carry
        col_p, col_key = inputs
        ratio = jnp.clip(jnp.where(remaining_p > 0, col_p / remaining_p, 0.0), 0.0, 1.0)
        draw = jax.random.binomial(col_key, remaining_n, ratio).astype(remaining_n.dtype)
        return (remaining_n - draw, remaining_p - col_p), draw

    keys = jax.random.split(key, C)
    (_, _), draws = jax.lax.scan(
        split, (n.astype(p.dtype), jnp.ones_like(n, dtype=p.dtype)), (p.T, keys)
    )
    return draws.T  # (R, C)


@partial(jax.jit, static_argnames=("num_samples", "thin_its"))
def _gibbs_read_counts(key, probs, counts, init_fracs, gamma, num_samples, thin_its):
    """Returns (num_samples, C) sampled abundance fractions."""

    def iteration(fracs, it_key):
        weighted = probs * fracs[None, :]
        row_sums = weighted.sum(axis=1, keepdims=True)
        posteriors = jnp.where(row_sums > 0, weighted / row_sums, 0.0)

        thin_key, gamma_key = jax.random.split(it_key)
        path_counts = _multinomial_rows(thin_key, counts, posteriors).sum(axis=0)

        draws = jax.random.gamma(gamma_key, path_counts + gamma)
        new_fracs = draws / draws.sum()
        return new_fracs, new_fracs

    keys = jax.random.split(key, num_samples * thin_its)
    _, all_fracs = jax.lax.scan(iteration, init_fracs, keys)
    return all_fracs[thin_its - 1 :: thin_its]


def gibbs_read_count_samples(
    probs: np.ndarray,
    counts: np.ndarray,
    abundances: np.ndarray,
    noise_count: float,
    total_count: float,
    rng_key,
    num_samples: int,
    thin_its: int = 25,
    gamma: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sample posterior read counts given EM point estimates.

    Returns (noise_samples (S,), abundance_samples (S, P)); sub-threshold
    abundances fold into the noise sample (reference :192-210)."""
    init_fracs = np.concatenate([abundances / total_count, [noise_count / total_count]])

    fracs = np.asarray(
        _gibbs_read_counts(
            rng_key,
            jnp.asarray(probs),
            jnp.asarray(counts),
            jnp.asarray(init_fracs, dtype=jnp.asarray(probs).dtype),
            float(gamma),
            int(num_samples),
            int(thin_its),
        ),
        dtype=np.float64,
    )

    sampled_counts = fracs * total_count
    path_samples = sampled_counts[:, :-1].copy()
    noise_samples = sampled_counts[:, -1].copy()
    low = fracs[:, :-1] < MIN_GIBBS_ABUNDANCE
    noise_samples += np.where(low, path_samples, 0.0).sum(axis=1)
    path_samples[low] = 0.0
    return noise_samples, path_samples
