"""Ragged -> padded cluster batching.

Cluster sizes are power-law distributed (the reference sorts clusters by
size for OpenMP load balance, src/main.cpp:811-827); on a TPU the
equivalent is bucketing cluster matrices into a handful of padded shapes
and vmapping the EM kernel over each bucket, so the whole inference pass
compiles O(#buckets) programs instead of O(#clusters).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..constants import MIN_EM_ABUNDANCE
from .em import em_abundances_batched
from ..backend import safe_default_backend


def _ceil_pow2(n: int, floor: int = 8) -> int:
    size = floor
    while size < n:
        size *= 2
    return size


def _ceil_pow4(n: int, floor: int = 8) -> int:
    """Coarser (4x-step) bucketing for the row axis: fewer compiled
    shapes at the cost of more padded compute."""
    size = floor
    while size < n:
        size *= 4
    return size


def em_postprocess(fracs: np.ndarray, total: float) -> Tuple[np.ndarray, float]:
    """The reference's sub-threshold folding (path_abundance_estimator.
    cpp:100-113): abundances below 1e-8 zero out, their mass plus the
    noise fraction becomes the noise count.  The masked sum runs
    SEQUENTIALLY in index order (cumsum), bitwise-matching the C++
    em_postprocess_one the native kernels use."""
    path_counts = fracs[:-1] * total
    low = fracs[:-1] < MIN_EM_ABUNDANCE
    low_counts = path_counts[low]
    noise_count = (
        float(low_counts.cumsum()[-1]) if low_counts.size else 0.0
    ) + float(fracs[-1] * total)
    path_counts = path_counts.copy()
    path_counts[low] = 0.0
    return path_counts, noise_count


def run_native_em(
    cluster_inputs: Sequence[Tuple[np.ndarray, np.ndarray]],
    max_em_its: int,
    max_rel_em_conv: float,
    n_threads: int = 0,
    resume_state=None,
    concat=None,
) -> List[Tuple[np.ndarray, float]]:
    """Ragged batched EM through the C++ kernel (CPU speed path): no
    padding, no shape buckets, per-cluster loops on worker threads —
    bitwise identical to calling the kernel per cluster.  Returns the
    same (path read counts, noise count) contract as run_batched_em.

    `resume_state`: optional (init_fracs list (C_i+... = width per
    cluster), conv_its array) — continues a bounded run from its exit
    state bitwise-identically (escalated tasks skip re-running the
    budget).

    `concat`: optional (probs_flat, counts_flat) when the caller's
    cluster_inputs are already in-order views over contiguous streams
    (the fused kernel's escalated-task emission) — skips the Python
    per-cluster concatenation, which dominates this wrapper's cost."""
    import ctypes
    import os

    from ..native import load_library

    lib = load_library()
    n = len(cluster_inputs)
    n_rows = np.array([p.shape[0] for p, _ in cluster_inputs], dtype=np.int64)
    n_cols = np.array([p.shape[1] for p, _ in cluster_inputs], dtype=np.int64)
    mat_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_rows * n_cols, out=mat_offsets[1:])
    row_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_rows, out=row_offsets[1:])
    col_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_cols, out=col_offsets[1:])

    if concat is not None:
        probs_concat = np.ascontiguousarray(concat[0], dtype=np.float64).ravel()
        counts_concat = np.ascontiguousarray(concat[1], dtype=np.float64)
        if probs_concat.size != int(mat_offsets[-1]) or counts_concat.size != int(
            row_offsets[-1]
        ):
            raise ValueError(
                "concat streams do not cover cluster_inputs exactly: "
                f"{probs_concat.size}/{int(mat_offsets[-1])} matrix elems, "
                f"{counts_concat.size}/{int(row_offsets[-1])} rows"
            )
    else:
        probs_concat = (
            np.concatenate(
                [np.ascontiguousarray(p, dtype=np.float64).ravel() for p, _ in cluster_inputs]
            )
            if n
            else np.empty(0, dtype=np.float64)
        )
        counts_concat = (
            np.concatenate([np.asarray(c, dtype=np.float64) for _, c in cluster_inputs])
            if n
            else np.empty(0, dtype=np.float64)
        )
    out_counts = np.empty(max(0, int(col_offsets[-1]) - n), dtype=np.float64)
    out_noise = np.empty(n, dtype=np.float64)

    if n_threads <= 0:
        from ..native import thread_budget

        n_threads = thread_budget()
    as_f64 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))  # noqa: E731
    as_i64 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))  # noqa: E731
    if not getattr(lib, "_em_counts_configured", False):
        lib.rpvg_em_ragged_counts_resume.restype = None
        lib.rpvg_em_ragged_counts_resume.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_double, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ]
        lib._em_counts_configured = True
    init_fracs_ptr = ctypes.POINTER(ctypes.c_double)()
    init_conv_ptr = ctypes.POINTER(ctypes.c_int64)()
    if resume_state is not None:
        init_fracs, init_conv = resume_state
        init_fracs = np.ascontiguousarray(init_fracs, dtype=np.float64)
        init_conv = np.ascontiguousarray(init_conv, dtype=np.int64)
        assert init_fracs.size == int(col_offsets[-1])
        assert init_conv.size == n
        init_fracs_ptr = as_f64(init_fracs)
        init_conv_ptr = as_i64(init_conv)
    lib.rpvg_em_ragged_counts_resume(
        as_f64(probs_concat), as_f64(counts_concat),
        as_i64(mat_offsets), as_i64(row_offsets), as_i64(col_offsets),
        as_i64(n_rows), as_i64(n_cols), n,
        int(max_em_its), float(max_rel_em_conv), int(n_threads),
        init_fracs_ptr, init_conv_ptr,
        as_f64(out_counts), as_f64(out_noise),
    )

    results: List[Tuple[np.ndarray, float]] = []
    for i in range(n):
        path_counts = out_counts[col_offsets[i] - i : col_offsets[i + 1] - (i + 1)]
        results.append((path_counts, float(out_noise[i])))
    return results


def native_em_available() -> bool:
    import os

    if os.environ.get("RPVG_TPU_NATIVE_EM", "1") == "0":
        return False
    try:
        from ..native import load_library

        return load_library() is not None
    except Exception:
        return False


def run_batched_em(
    cluster_inputs: Sequence[Tuple[np.ndarray, np.ndarray]],
    max_em_its: int = 10000,
    max_rel_em_conv: float = 0.001,
    dtype=None,
    max_bucket_rows: int = 4096,
    use_pallas: str = "auto",
    stage_floor: int = 0,
) -> List[Tuple[np.ndarray, float]]:
    """Run EM over many clusters with shape bucketing.

    cluster_inputs: per cluster (noise-normalised probs (R, P+1), counts
    (R,)).  Returns per cluster (path read counts, noise count) with the
    reference's sub-threshold folding.  On TPU backends the
    VMEM-resident Pallas kernel handles buckets that fit on-chip;
    elsewhere (and for oversized buckets) the XLA while-loop kernel
    runs.  TPU uses float32 (no native f64), CPU float64."""
    import jax

    import os

    on_tpu = safe_default_backend() == "tpu"
    if dtype is None:
        dtype = np.float32 if on_tpu else np.float64
    # CPU speed path: the C++ ragged kernel (threads, no padding) —
    # identical convergence contract; RPVG_TPU_NATIVE_EM=0 disables.
    if not on_tpu and dtype == np.float64 and native_em_available():
        return run_native_em(cluster_inputs, max_em_its, max_rel_em_conv)
    # TPU hybrid routing: the cluster population is power-law sized, so
    # most matrices are tiny and their EM is latency-bound on the
    # device link while the few big buckets carry the FLOPs.  Route
    # small clusters to the native host kernel and let them run WHILE
    # the big buckets' transfers/kernels are in flight (device chunks
    # are dispatched asynchronously below, gathered at the end).
    # The default cutoff is tuned for a high-latency (tunnelled) link;
    # PCIe/ICI-attached hosts can lower it to use the device more.
    # RPVG_TPU_HYBRID_EM_AREA=0 sends everything to the device.
    # Escalated tasks (stage_floor > 0) are PROVEN to need more than
    # stage_floor iterations — heavy compute per transferred byte — so
    # they always go to the device; the area-based host routing below
    # only applies to cold dispatches of unknown iteration count.
    host_idx: List[int] = []
    if on_tpu and stage_floor <= 0 and native_em_available():
        area_cutoff = int(os.environ.get("RPVG_TPU_HYBRID_EM_AREA", 262144))
        if area_cutoff > 0:
            host_idx = [
                idx
                for idx, (probs, _) in enumerate(cluster_inputs)
                if probs.shape[0] * probs.shape[1] < area_cutoff
            ]
    host_set = set(host_idx)

    results: List[Tuple[np.ndarray, float]] = [None] * len(cluster_inputs)
    pending = dispatch_em_device(
        cluster_inputs,
        [idx for idx in range(len(cluster_inputs)) if idx not in host_set],
        max_em_its, max_rel_em_conv,
        dtype=dtype, max_bucket_rows=max_bucket_rows, use_pallas=use_pallas,
        stage_floor=stage_floor,
    )

    # Device chunks are now in flight; the host kernel fills in the
    # latency-bound small clusters meanwhile.
    if host_idx:
        host_results = run_native_em(
            [cluster_inputs[idx] for idx in host_idx], max_em_its, max_rel_em_conv
        )
        for idx, result in zip(host_idx, host_results):
            results[idx] = result

    gather_em_device(pending, cluster_inputs, results)
    return results


def fuse_em_enabled() -> bool:
    """Whether the multi-bucket fused EM launch is enabled.

    Fusion defaults OFF: the first end-to-end A/B (FUSE_AB_r05.json)
    measured the fused launch 2.6x slower than separate launches with
    the round-4 shared-loop kernel (convergence coupling) and still
    ~1.9x slower after per-block loops were decoupled — the single
    launch keeps every block VMEM-resident for the whole group while
    the (K-1) saved dispatches are only ~25-35ms each, an order of
    magnitude smaller.  The round-4 ">1ms dispatch => fuse" link gate
    was an inference from kernel-time neutrality under forced
    iterations, which is structurally blind to real power-law
    convergence.  RPVG_TPU_FUSE_EM=1 remains an explicit opt-in."""
    import os

    return os.environ.get("RPVG_TPU_FUSE_EM", "0") == "1"


def dispatch_em_device(
    cluster_inputs: Sequence[Tuple[np.ndarray, np.ndarray]],
    indices: Sequence[int],
    max_em_its: int = 10000,
    max_rel_em_conv: float = 0.001,
    dtype=None,
    max_bucket_rows: int = 4096,
    use_pallas: str = "auto",
    stage_floor: int = 0,
):
    """Dispatch the indexed clusters' EM to the device WITHOUT blocking:
    pads shape buckets, enqueues transfers + kernels, returns a pending
    handle for :func:`gather_em_device`.  The caller overlaps host work
    (native inference of other clusters, writer threads) while the
    device round trip is in flight — the reference's producer-consumer
    queue pipeline (src/main.cpp:654-693) applied across the
    host/device boundary."""
    import os

    import jax

    on_tpu = safe_default_backend() == "tpu"
    if dtype is None:
        dtype = np.float32 if on_tpu else np.float64
    # Validated on TPU v5e (tools/tpu_validate.py): matches the float64
    # reference to ~3e-7.  Measured readback-anchored on v5e
    # (TPU_KERNELS_tpu.json, round 4): 300 vs 67 GEUPS at the 64x256x64
    # reference shape and faster than the XLA while-loop at every
    # production bucket shape (mix aggregate 102 vs 40).
    # RPVG_TPU_PALLAS=0 force-disables.
    pallas_enabled = use_pallas == "on" or (
        use_pallas == "auto" and on_tpu and os.environ.get("RPVG_TPU_PALLAS") != "0"
    )

    indices = list(indices)
    buckets: Dict[Tuple[int, int], List[int]] = {}
    # Small ESCALATED sets are link-latency bound (each bucket is a
    # ~25ms round trip on a tunnelled device): unify the column pad so
    # only the row classes remain — <=4 chunks instead of ~a dozen.
    # Gated on stage_floor (escalation) — a general dispatch with
    # power-law widths would otherwise pad every cluster to the global
    # max and blow up the padded FLOPs/bytes.
    c_pad_all = 0
    if stage_floor > 0 and 0 < len(indices) <= 512:
        c_pad_all = _ceil_pow2(
            max(cluster_inputs[idx][0].shape[1] for idx in indices)
        )
    for idx in indices:
        R, C = cluster_inputs[idx][0].shape
        key = (_ceil_pow4(R), c_pad_all or _ceil_pow2(C))
        buckets.setdefault(key, []).append(idx)

    # Plan the chunks first (shapes only — the fusion grouping needs
    # nothing else); each padded block is built lazily right before its
    # dispatch, so peak host memory stays at one fusion group
    # (VMEM-budget sized), not the whole dispatch.
    plans = []  # (chunk indices, R_pad, C_pad, B)
    for (R_pad, C_pad), chunk_indices in buckets.items():
        # Split huge buckets to bound device memory.
        max_batch = max(1, max_bucket_rows // R_pad) * 8
        for chunk_start in range(0, len(chunk_indices), max_batch):
            chunk = chunk_indices[chunk_start : chunk_start + max_batch]
            # Pad the batch axis too so (B, R, C) shapes stay cached
            # (dummy zero-mask clusters converge immediately).
            plans.append(
                (chunk, R_pad, C_pad, _ceil_pow2(len(chunk), floor=1))
            )

    def build_block(chunk, R_pad, C_pad, B):
        probs_pad = np.zeros((B, R_pad, C_pad), dtype=dtype)
        counts_pad = np.zeros((B, R_pad), dtype=dtype)
        col_masks = np.zeros((B, C_pad), dtype=dtype)
        for b, idx in enumerate(chunk):
            probs, counts = cluster_inputs[idx]
            R, C = probs.shape
            probs_pad[b, :R, :C] = probs
            counts_pad[b, :R] = counts
            col_masks[b, :C] = 1.0
        return probs_pad, counts_pad, col_masks

    pending = []  # (chunk indices, device array or ready ndarray)
    fuse_group = []  # chunks sharing one fused Pallas launch
    fuse_bytes = 0

    fuse_ok = fuse_em_enabled()

    def flush_fused():
        nonlocal fuse_bytes, pallas_enabled
        if not fuse_group:
            return
        from ..ops.em_pallas import em_pallas_batched, em_pallas_fused

        try:
            if len(fuse_group) == 1:
                chunk, p, c, m = fuse_group[0]
                pending.append(
                    (chunk, em_pallas_batched(p, c, m, max_em_its, max_rel_em_conv))
                )
            else:
                outs = em_pallas_fused(
                    [(p, c, m) for _, p, c, m in fuse_group],
                    max_em_its, max_rel_em_conv,
                )
                for (chunk, _, _, _), fracs in zip(fuse_group, outs):
                    pending.append((chunk, fracs))
        except Exception as exc:  # pragma: no cover - hardware-specific
            import sys

            print(
                f"pallas EM unavailable ({type(exc).__name__}); using XLA",
                file=sys.stderr,
            )
            pallas_enabled = False
            for chunk, p, c, m in fuse_group:
                fracs, _ = em_abundances_batched(
                    p, c, m, max_em_its, max_rel_em_conv, stage_floor=stage_floor
                )
                pending.append((chunk, fracs))
        fuse_group.clear()
        fuse_bytes = 0

    from ..ops.em_pallas import _VMEM_BLOCK_BYTES, fused_vmem_cost

    itemsize = np.dtype(dtype).itemsize
    for chunk, R_pad, C_pad, B in plans:
        # Per-grid-step VMEM feasibility (same bound the chunked single
        # kernel enforces via its G choice).
        fits_vmem = R_pad * C_pad * itemsize * 4 <= _VMEM_BLOCK_BYTES
        if not (pallas_enabled and fits_vmem):
            flush_fused()
            probs_pad, counts_pad, col_masks = build_block(chunk, R_pad, C_pad, B)
            fracs, _ = em_abundances_batched(
                probs_pad, counts_pad, col_masks, max_em_its,
                max_rel_em_conv, stage_floor=stage_floor,
            )
            pending.append((chunk, fracs))
            continue
        cost = fused_vmem_cost(B, R_pad, C_pad, itemsize)
        if not fuse_ok or cost > _VMEM_BLOCK_BYTES:
            # Per-bucket launch: either this link's dispatch is cheap
            # enough that fusing only costs kernel time, or the block
            # is too big to co-reside and the chunked-grid single
            # kernel streams it in G-cluster steps.  (A singleton group
            # through flush_fused reuses its Pallas->XLA fallback.)
            flush_fused()
            fuse_group.append((chunk, *build_block(chunk, R_pad, C_pad, B)))
            flush_fused()
            continue
        if fuse_bytes + cost > _VMEM_BLOCK_BYTES:
            # Full fusion budget: launch what we have, start a new group.
            flush_fused()
        fuse_group.append((chunk, *build_block(chunk, R_pad, C_pad, B)))
        fuse_bytes += cost
    flush_fused()
    return pending


def gather_em_device(pending, cluster_inputs, results) -> None:
    """Block on the pending device chunks and fill `results` with the
    (path read counts, noise count) contract (sub-threshold folding in
    f64 on the host, exactly like the native kernel's tail)."""
    for chunk, fracs in pending:
        fracs = np.asarray(fracs, dtype=np.float64)
        for b, idx in enumerate(chunk):
            probs, counts = cluster_inputs[idx]
            R, C = probs.shape
            total = float(counts.sum())
            results[idx] = em_postprocess(fracs[b, :C], total)
