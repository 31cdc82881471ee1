"""Pallas TPU kernel for the EM abundance fixed point.

The EM iteration is HBM-bandwidth bound: XLA streams the (R, C)
probability matrix from HBM on every iteration.  This kernel instead
pins one padded cluster block in VMEM per grid step and runs the entire
fixed-point loop on-chip — the matrix is read from HBM exactly once per
cluster, turning an O(iterations x R x C) HBM traffic pattern into
O(R x C).

Grid: one program per cluster in the padded batch.  The batching layer
pads R and C to powers of two >= 8, which satisfies TPU tiling.

Convergence follows the engine contract
(/root/reference/src/path_abundance_estimator.cpp:47-99): every
abundance >= 1e-8 must move relatively less than `max_rel_em_conv` for
10 consecutive iterations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..constants import MIN_EM_ABUNDANCE, MIN_EM_CONV_ITS


def _em_kernel(probs_ref, counts_ref, col_mask_ref, abundances_ref, *,
               max_em_its: int, max_rel_em_conv: float):
    probs = probs_ref[:]          # (R, C), resident in VMEM for all iterations
    counts = counts_ref[:]        # (1, R)
    col_mask = col_mask_ref[:]    # (1, C)

    n_cols = jnp.maximum(jnp.sum(col_mask), 1.0)
    total = jnp.maximum(jnp.sum(counts), 1.0)
    init = jnp.where(col_mask > 0, 1.0 / n_cols, 0.0)  # (1, C)

    def cond(state):
        _, conv_its, it = state
        return (it < max_em_its) & (conv_its < MIN_EM_CONV_ITS)

    def body(state):
        abundances, conv_its, it = state
        weighted = probs * abundances                  # (R, C) broadcast over rows
        row_sums = jnp.sum(weighted, axis=1, keepdims=True)
        posteriors = jnp.where(row_sums > 0, weighted / row_sums, 0.0)
        new = (
            jnp.dot(counts, posteriors, preferred_element_type=probs.dtype) / total
        )

        active = (new >= MIN_EM_ABUNDANCE) & (col_mask > 0)
        rel_diff = jnp.where(
            active, jnp.abs(new - abundances) / jnp.where(active, new, 1.0), 0.0
        )
        has_converged = jnp.all(rel_diff <= max_rel_em_conv)
        conv_its = jnp.where(has_converged, conv_its + 1, 0)
        return new, conv_its, it + 1

    abundances, _, _ = jax.lax.while_loop(
        cond, body, (init, jnp.int32(0), jnp.int32(0))
    )
    abundances_ref[:] = abundances


@partial(jax.jit, static_argnames=("max_em_its", "max_rel_em_conv", "interpret"))
def em_pallas_batched(
    probs: jax.Array,      # (B, R, C), padded
    counts: jax.Array,     # (B, R)
    col_masks: jax.Array,  # (B, C)
    max_em_its: int = 10000,
    max_rel_em_conv: float = 0.001,
    interpret: bool = False,
) -> jax.Array:
    """Returns (B, C) abundance fractions."""
    B, R, C = probs.shape
    kernel = partial(
        _em_kernel, max_em_its=max_em_its, max_rel_em_conv=float(max_rel_em_conv)
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, R, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, R), lambda b: (b, 0)),
            pl.BlockSpec((None, C), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((None, C), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C), probs.dtype),
        interpret=interpret,
    )(probs, counts, col_masks)


def em_pallas_available() -> bool:
    return jax.default_backend() == "tpu"
