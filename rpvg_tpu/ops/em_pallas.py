"""Pallas TPU kernel for the EM abundance fixed point.

The EM iteration is bandwidth/latency bound: XLA re-streams the padded
(B, R, C) probability stack through HBM (and pays while-loop dispatch
overhead) every iteration.  This kernel pins a CHUNK of G clusters in
VMEM per grid step and runs the entire fixed-point loop on-chip, with
two structural choices that the measured round-3 kernel (one cluster
per grid step, (R, C) layout) got wrong:

* **Chunked grid.** One grid step owns G clusters, so every while-loop
  iteration works on G*R*C elements instead of R*C — the serial
  dependency chain of the fixed point is amortised across the whole
  chunk exactly like the XLA batched loop, while the matrices still
  load from HBM exactly once.
* **(C, G, R) layout.** The row axis is the largest padded dimension
  (the batcher pads rows to powers of four, columns to powers of two —
  infer/batching.py), so rows ride the 128-wide lane dimension and
  clusters ride sublanes.  The round-3 (R, C) layout put the SMALL
  column axis on lanes: C=64 buckets wasted half the VPU, C=8 buckets
  15/16 of it.
* **q-formulation.** new_c = a_c * (sum_r counts_r/rowsum_r * P_rc) /
  total needs two multiply-reduce passes over the block and never
  materialises the (R, C) `weighted`/`posteriors` temporaries of the
  textbook step.

Convergence follows the engine contract
(/root/reference/src/path_abundance_estimator.cpp:47-99): every
abundance >= 1e-8 must move relatively less than `max_rel_em_conv` for
10 consecutive iterations — per cluster, with converged clusters frozen
so batchmates can keep iterating without changing them (bit-matching
the XLA batched loop's semantics in infer/em.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..constants import MIN_EM_ABUNDANCE, MIN_EM_CONV_ITS
from ..backend import safe_default_backend


def _em_kernel(probs_ref, counts_ref, col_mask_ref, abundances_ref, *,
               max_em_its: int, max_rel_em_conv: float):
    probs = probs_ref[:]          # (C, G, R), resident in VMEM for all iterations
    counts = counts_ref[:]        # (G, R)
    col_mask = col_mask_ref[:]    # (C, G)

    # All constants explicitly typed: Mosaic rejects stray f64 scalars
    # that weak Python literals can introduce under x64.
    dt = probs.dtype
    one = jnp.asarray(1.0, dt)
    zero = jnp.asarray(0.0, dt)
    conv_threshold = jnp.asarray(max_rel_em_conv, dt)
    min_abundance = jnp.asarray(MIN_EM_ABUNDANCE, dt)

    n_cols = jnp.maximum(jnp.sum(col_mask, axis=0, keepdims=True), one)  # (1, G)
    # (G, 1) lane-reduce, re-laid out once to a (1, G) row for the
    # column-shaped broadcasts below.
    totals = jnp.maximum(jnp.sum(counts, axis=1, keepdims=True), one).reshape(
        1, counts.shape[0]
    )
    inv_totals = one / totals
    init = col_mask / n_cols      # (C, G): zero on masked columns

    def cond(state):
        _, conv_its, it = state
        return (it < max_em_its) & jnp.any(conv_its < MIN_EM_CONV_ITS)

    def body(state):
        a, conv_its, it = state
        # rs_gr = sum_c P_cgr * a_cg  — multiply-reduce over sublanes.
        rs = jnp.sum(probs * a[:, :, None], axis=0)            # (G, R)
        q = jnp.where(rs > zero, counts / rs, zero)            # (G, R)
        # t_cg = sum_r P_cgr * q_gr  — multiply-reduce over lanes.
        t = jnp.sum(probs * q[None, :, :], axis=2)             # (C, G)
        new = a * t * inv_totals                               # (C, G)

        already_done = conv_its >= MIN_EM_CONV_ITS             # (1, G)
        new = jnp.where(already_done, a, new)
        active = (new >= min_abundance) & (col_mask > zero)
        rel_diff = jnp.where(
            active, jnp.abs(new - a) / jnp.where(active, new, one), zero
        )
        has_converged = jnp.all(rel_diff <= conv_threshold, axis=0, keepdims=True)
        conv_its = jnp.where(
            already_done, conv_its, jnp.where(has_converged, conv_its + 1, 0)
        )
        return new, conv_its, it + 1

    G = probs.shape[1]
    abundances, _, _ = jax.lax.while_loop(
        cond, body, (init, jnp.zeros((1, G), jnp.int32), jnp.int32(0))
    )
    abundances_ref[:] = abundances


# One chunk's probability block must sit in VMEM for the whole loop
# (plus rs/q temporaries and pipeline headroom out of ~16MB/core).
_VMEM_BLOCK_BYTES = 8 * 2**20


def _chunk_clusters(B: int, R: int, C: int, itemsize: int) -> int:
    """Clusters per grid step: as many as fit the VMEM block budget,
    power-of-two so the padded batch (already power-of-two) divides."""
    per_cluster = max(1, R * C * itemsize)
    g = 1
    while g * 2 <= B and (g * 2) * per_cluster <= _VMEM_BLOCK_BYTES:
        g *= 2
    return g


@partial(jax.jit, static_argnames=("max_em_its", "max_rel_em_conv", "interpret"))
def _em_pallas_call(probs, counts, col_masks, max_em_its, max_rel_em_conv, interpret):
    B, R, C = probs.shape
    G = _chunk_clusters(B, R, C, probs.dtype.itemsize)
    if B % G:
        # Pad the batch to a multiple of the chunk so the grid covers
        # every cluster (padded slots have zero masks and converge on
        # iteration one); dispatch_em_device pads B to powers of two
        # already, but the public API must not silently return
        # uninitialized output columns for a ragged tail.
        B_pad = ((B + G - 1) // G) * G
        probs = jnp.pad(probs, ((0, B_pad - B), (0, 0), (0, 0)))
        counts = jnp.pad(counts, ((0, B_pad - B), (0, 0)))
        col_masks = jnp.pad(col_masks, ((0, B_pad - B), (0, 0)))
    kernel = partial(
        _em_kernel, max_em_its=max_em_its, max_rel_em_conv=float(max_rel_em_conv)
    )
    # (C, B, R): rows on lanes, clusters on sublanes (see module doc).
    probs_t = jnp.transpose(probs, (2, 0, 1))
    col_masks_t = jnp.transpose(col_masks, (1, 0))
    B_run = probs.shape[0]
    out = pl.pallas_call(
        kernel,
        grid=(B_run // G,),
        in_specs=[
            pl.BlockSpec((C, G, R), lambda b: (0, b, 0)),
            pl.BlockSpec((G, R), lambda b: (b, 0)),
            pl.BlockSpec((C, G), lambda b: (0, b)),
        ],
        out_specs=pl.BlockSpec((C, G), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((C, B_run), probs.dtype),
        interpret=interpret,
    )(probs_t, counts, col_masks_t)
    return jnp.transpose(out, (1, 0))[:B]


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


def _em_fused_kernel(*refs, n_blocks: int, max_em_its: int,
                     max_rel_em_conv: float):
    """INDEPENDENT per-block fixed-point loops over `n_blocks`
    differently-shaped bucket blocks, all resident in VMEM, in ONE
    kernel launch.  The launch saves (K-1) device dispatches (the
    point of fusing on a high-latency link) while each block's loop
    stops at ITS OWN convergence — round 4 ran one SHARED loop whose
    cond() required every block converged, so with real power-law
    convergence a single slow cluster held the whole fused group at
    max-iteration wall time (measured 2.6x slower end to end,
    FUSE_AB_r05.json; forced-iteration microbenches were structurally
    blind to the coupling).  Per-block trajectories are identical to
    the single-bucket kernel's, so results stay bitwise-pinned."""
    probs = [refs[k][:] for k in range(n_blocks)]                 # (C,G,R)
    counts = [refs[n_blocks + k][:] for k in range(n_blocks)]     # (G,R)
    masks = [refs[2 * n_blocks + k][:] for k in range(n_blocks)]  # (C,G)
    outs = refs[3 * n_blocks :]

    dt = probs[0].dtype
    one = jnp.asarray(1.0, dt)
    zero = jnp.asarray(0.0, dt)
    conv_threshold = jnp.asarray(max_rel_em_conv, dt)
    min_abundance = jnp.asarray(MIN_EM_ABUNDANCE, dt)

    for k in range(n_blocks):
        probs_k, counts_k, mask_k = probs[k], counts[k], masks[k]
        n_cols = jnp.maximum(jnp.sum(mask_k, axis=0, keepdims=True), one)
        inv_totals = one / jnp.maximum(
            jnp.sum(counts_k, axis=1, keepdims=True), one
        ).reshape(1, counts_k.shape[0])
        init = mask_k / n_cols

        def cond(state):
            _, conv_its, it = state
            return (it < max_em_its) & jnp.any(conv_its < MIN_EM_CONV_ITS)

        def body(state, probs_k=probs_k, counts_k=counts_k, mask_k=mask_k,
                 inv_totals=inv_totals):
            a, conv_its, it = state
            rs = jnp.sum(probs_k * a[:, :, None], axis=0)        # (G, R)
            q = jnp.where(rs > zero, counts_k / rs, zero)        # (G, R)
            t = jnp.sum(probs_k * q[None, :, :], axis=2)         # (C, G)
            new = a * t * inv_totals

            already_done = conv_its >= MIN_EM_CONV_ITS
            new = jnp.where(already_done, a, new)
            active = (new >= min_abundance) & (mask_k > zero)
            rel_diff = jnp.where(
                active, jnp.abs(new - a) / jnp.where(active, new, one), zero
            )
            has_converged = jnp.all(
                rel_diff <= conv_threshold, axis=0, keepdims=True
            )
            conv_its = jnp.where(
                already_done, conv_its,
                jnp.where(has_converged, conv_its + 1, 0),
            )
            return new, conv_its, it + 1

        G = probs_k.shape[1]
        final_a, _, _ = jax.lax.while_loop(
            cond, body, (init, jnp.zeros((1, G), jnp.int32), jnp.int32(0))
        )
        outs[k][:] = final_a


@partial(jax.jit, static_argnames=("max_em_its", "max_rel_em_conv", "interpret"))
def _em_fused_call(probs_t, counts, masks_t, max_em_its, max_rel_em_conv,
                   interpret):
    n_blocks = len(probs_t)
    kernel = partial(
        _em_fused_kernel, n_blocks=n_blocks, max_em_its=max_em_its,
        max_rel_em_conv=float(max_rel_em_conv),
    )
    return pl.pallas_call(
        kernel,
        in_specs=(
            [pl.BlockSpec(p.shape, None) for p in probs_t]
            + [pl.BlockSpec(c.shape, None) for c in counts]
            + [pl.BlockSpec(m.shape, None) for m in masks_t]
        ),
        out_specs=[pl.BlockSpec(m.shape, None) for m in masks_t],
        out_shape=[
            jax.ShapeDtypeStruct(m.shape, probs_t[0].dtype) for m in masks_t
        ],
        interpret=interpret,
    )(*probs_t, *counts, *masks_t)


def em_pallas_fused(
    blocks,                       # [(probs (B,R,C), counts (B,R), masks (B,C))]
    max_em_its: int = 10000,
    max_rel_em_conv: float = 0.001,
    interpret: bool = False,
):
    """One Pallas launch over several padded shape buckets: returns a
    list of (B, C) abundance fractions, one per block, numerically
    identical to per-block :func:`em_pallas_batched` (same update, same
    per-cluster freeze).  Caller guarantees the blocks' combined bytes
    fit :data:`_VMEM_BLOCK_BYTES` (see :func:`fused_vmem_cost`)."""
    prev_x64 = jax.config.jax_enable_x64
    if prev_x64:
        jax.config.update("jax_enable_x64", False)
    try:
        probs_t = tuple(
            jnp.transpose(jnp.asarray(p, jnp.float32), (2, 0, 1))
            for p, _, _ in blocks
        )
        counts = tuple(jnp.asarray(c, jnp.float32) for _, c, _ in blocks)
        masks_t = tuple(
            jnp.transpose(jnp.asarray(m, jnp.float32), (1, 0))
            for _, _, m in blocks
        )
        outs = _em_fused_call(
            probs_t, counts, masks_t, int(max_em_its), float(max_rel_em_conv),
            bool(interpret),
        )
        return [jnp.transpose(out, (1, 0)) for out in outs]
    finally:
        if prev_x64:
            jax.config.update("jax_enable_x64", True)


def fused_vmem_cost(B: int, R: int, C: int, itemsize: int = 4) -> int:
    """VMEM bytes one block contributes to a fused launch: the resident
    (C, G=B, R) matrix, the (G, R) counts input and rs/q temporaries,
    and the (C, G) mask / abundance / next-abundance / convergence /
    output buffers.  Counting every resident buffer (not just the probs
    block) keeps a fuse group packed to the _VMEM_BLOCK_BYTES budget
    from silently exceeding real VMEM and tripping the whole-group
    Pallas->XLA fallback."""
    return (B * R * C + 3 * B * R + 5 * B * C) * itemsize


def em_pallas_available() -> bool:
    return safe_default_backend() == "tpu"
