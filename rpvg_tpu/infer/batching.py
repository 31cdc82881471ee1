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


def run_batched_em(
    cluster_inputs: Sequence[Tuple[np.ndarray, np.ndarray]],
    max_em_its: int = 10000,
    max_rel_em_conv: float = 0.001,
    dtype=None,
    max_bucket_rows: int = 4096,
    use_pallas: str = "auto",
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

    on_tpu = jax.default_backend() == "tpu"
    if dtype is None:
        dtype = np.float32 if on_tpu else np.float64
    # Validated on TPU v5e (tools/tpu_validate.py): matches the float64
    # reference to ~2e-7 and beats the XLA while-loop by >100x steady
    # state.  RPVG_TPU_PALLAS=0 force-disables.
    pallas_enabled = use_pallas == "on" or (
        use_pallas == "auto" and on_tpu and os.environ.get("RPVG_TPU_PALLAS") != "0"
    )

    buckets: Dict[Tuple[int, int], List[int]] = {}
    for idx, (probs, counts) in enumerate(cluster_inputs):
        R, C = probs.shape
        key = (_ceil_pow4(R), _ceil_pow2(C))
        buckets.setdefault(key, []).append(idx)

    results: List[Tuple[np.ndarray, float]] = [None] * len(cluster_inputs)

    for (R_pad, C_pad), indices in buckets.items():
        # Split huge buckets to bound device memory.
        max_batch = max(1, max_bucket_rows // R_pad) * 8
        for chunk_start in range(0, len(indices), max_batch):
            chunk = indices[chunk_start : chunk_start + max_batch]
            # Pad the batch axis too so (B, R, C) shapes stay cached
            # (dummy zero-mask clusters converge immediately).
            B = _ceil_pow2(len(chunk), floor=1)
            probs_pad = np.zeros((B, R_pad, C_pad), dtype=dtype)
            counts_pad = np.zeros((B, R_pad), dtype=dtype)
            col_masks = np.zeros((B, C_pad), dtype=dtype)
            for b, idx in enumerate(chunk):
                probs, counts = cluster_inputs[idx]
                R, C = probs.shape
                probs_pad[b, :R, :C] = probs
                counts_pad[b, :R] = counts
                col_masks[b, :C] = 1.0

            # Keep the whole block + temporaries comfortably inside VMEM.
            fits_vmem = R_pad * C_pad * np.dtype(dtype).itemsize * 4 <= 8 * 2**20
            fracs = None
            if pallas_enabled and fits_vmem:
                try:
                    from ..ops.em_pallas import em_pallas_batched

                    fracs = np.asarray(
                        em_pallas_batched(
                            probs_pad, counts_pad, col_masks, max_em_its, max_rel_em_conv
                        ),
                        dtype=np.float64,
                    )
                except Exception as exc:  # pragma: no cover - hardware-specific
                    import sys

                    print(
                        f"pallas EM unavailable ({type(exc).__name__}); using XLA",
                        file=sys.stderr,
                    )
                    pallas_enabled = False
            if fracs is None:
                fracs, _ = em_abundances_batched(
                    probs_pad, counts_pad, col_masks, max_em_its, max_rel_em_conv
                )

            for b, idx in enumerate(chunk):
                probs, counts = cluster_inputs[idx]
                R, C = probs.shape
                total = float(counts.sum())
                abundances = fracs[b, :C]
                path_counts = abundances[:-1] * total
                low = abundances[:-1] < MIN_EM_ABUNDANCE
                noise_count = float(path_counts[low].sum()) + float(abundances[-1] * total)
                path_counts = path_counts.copy()
                path_counts[low] = 0.0
                results[idx] = (path_counts, noise_count)

    return results
