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

    # All constants explicitly typed: Mosaic rejects stray f64 scalars
    # that weak Python literals can introduce under x64.
    dt = probs.dtype
    one = jnp.asarray(1.0, dt)
    zero = jnp.asarray(0.0, dt)
    conv_threshold = jnp.asarray(max_rel_em_conv, dt)
    min_abundance = jnp.asarray(MIN_EM_ABUNDANCE, dt)

    n_cols = jnp.maximum(jnp.sum(col_mask), one)
    total = jnp.maximum(jnp.sum(counts), one)
    init = jnp.where(col_mask > zero, one / n_cols, zero)  # (1, C)

    def cond(state):
        _, conv_its, it = state
        return (it < max_em_its) & (conv_its < MIN_EM_CONV_ITS)

    def body(state):
        abundances, conv_its, it = state
        weighted = probs * abundances                  # (R, C) broadcast over rows
        row_sums = jnp.sum(weighted, axis=1, keepdims=True)
        posteriors = jnp.where(row_sums > zero, weighted / row_sums, zero)
        # HIGHEST precision: the MXU's default bf16 passes cost ~1e-3
        # relative error on the count contraction, outside tolerance.
        new = (
            jax.lax.dot_general(
                counts,
                posteriors,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=dt,
            )
            / total
        )

        active = (new >= min_abundance) & (col_mask > zero)
        rel_diff = jnp.where(
            active, jnp.abs(new - abundances) / jnp.where(active, new, one), zero
        )
        has_converged = jnp.all(rel_diff <= conv_threshold)
        conv_its = jnp.where(has_converged, conv_its + 1, 0)
        return new, conv_its, it + 1

    abundances, _, _ = jax.lax.while_loop(
        cond, body, (init, jnp.int32(0), jnp.int32(0))
    )
    abundances_ref[:] = abundances


@partial(jax.jit, static_argnames=("max_em_its", "max_rel_em_conv", "interpret"))
def _em_pallas_call(probs, counts, col_masks, max_em_its, max_rel_em_conv, interpret):
    B, R, C = probs.shape
    kernel = partial(
        _em_kernel, max_em_its=max_em_its, max_rel_em_conv=float(max_rel_em_conv)
    )
    # Vectors carry an explicit singleton row so every block's trailing
    # two dims are TPU-tileable ((1, R) / (1, C) with the last dim equal
    # to the full array dim).
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, R, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, 1, R), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, 1, C), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, 1, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 1, C), probs.dtype),
        interpret=interpret,
    )(probs, counts[:, None, :], col_masks[:, None, :])
    return out[:, 0, :]


def em_pallas_batched(
    probs: jax.Array,      # (B, R, C), padded
    counts: jax.Array,     # (B, R)
    col_masks: jax.Array,  # (B, C)
    max_em_its: int = 10000,
    max_rel_em_conv: float = 0.001,
    interpret: bool = False,
) -> jax.Array:
    """Returns (B, C) abundance fractions.

    Traced with x64 disabled: Mosaic rejects the 64-bit index/scalar
    constants that global x64 mode introduces, and the padded buckets
    are float32 on TPU anyway."""
    prev_x64 = jax.config.jax_enable_x64
    if prev_x64:
        jax.config.update("jax_enable_x64", False)
    try:
        return _em_pallas_call(
            jnp.asarray(probs, dtype=jnp.float32),
            jnp.asarray(counts, dtype=jnp.float32),
            jnp.asarray(col_masks, dtype=jnp.float32),
            int(max_em_its),
            float(max_rel_em_conv),
            bool(interpret),
        )
    finally:
        if prev_x64:
            jax.config.update("jax_enable_x64", True)


def em_pallas_available() -> bool:
    return jax.default_backend() == "tpu"
