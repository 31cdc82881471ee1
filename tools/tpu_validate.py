#!/usr/bin/env python
"""On-hardware kernel validation: runs the device kernels on the real
TPU and checks them against CPU float64 references.

Usage: python tools/tpu_validate.py [--quick]
Exits 0 when every check passes; prints one line per check.
Designed to survive a flaky device tunnel: each phase prints before it
runs so a hang is attributable, and the process exits via os._exit.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import rpvg_tpu  # noqa: F401  (x64 + cache config)
import jax


def main() -> int:
    quick = "--quick" in sys.argv
    print(f"backend: {jax.default_backend()} devices: {jax.devices()}", flush=True)

    from rpvg_tpu.infer.em import em_abundances_batched
    from rpvg_tpu.infer.posteriors import _diploid_pair_scores
    from rpvg_tpu.ops.em_pallas import em_pallas_batched

    rng = np.random.default_rng(0)
    B, R, C = (8, 32, 16) if quick else (64, 128, 32)
    probs = rng.random((B, R, C)).astype(np.float32)
    probs /= probs.sum(axis=2, keepdims=True)
    counts = rng.integers(1, 20, size=(B, R)).astype(np.float32)
    masks = np.ones((B, C), dtype=np.float32)

    failures = 0

    # CPU float64 reference via a fresh subprocess-free numpy EM.
    def numpy_em(p, n, cap=1000, conv=0.001):
        a = np.full(p.shape[1], 1.0 / p.shape[1])
        total = n.sum()
        conv_its = 0
        for _ in range(cap):
            w = p * a
            rs = w.sum(axis=1, keepdims=True)
            post = np.where(rs > 0, w / rs, 0.0)
            new = n @ post / total
            active = new >= 1e-8
            rel = np.where(active, np.abs(new - a) / np.where(active, new, 1), 0)
            conv_its = conv_its + 1 if np.all(rel <= conv) else 0
            a = new
            if conv_its >= 10:
                break
        return a

    reference = np.stack([numpy_em(probs[b].astype(np.float64), counts[b].astype(np.float64)) for b in range(B)])

    print("check: XLA batched EM ...", flush=True)
    t0 = time.time()
    xla, _ = em_abundances_batched(probs, counts, masks, 1000, 0.001)
    t_xla = time.time() - t0
    ok = np.allclose(xla, reference, rtol=5e-3, atol=1e-4)
    print(f"  {'OK' if ok else 'MISMATCH'} ({t_xla:.2f}s, max diff {np.abs(xla - reference).max():.2e})", flush=True)
    failures += not ok

    print("check: Pallas EM ...", flush=True)
    try:
        t0 = time.time()
        pal = np.asarray(em_pallas_batched(probs, counts, masks, 1000, 0.001))
        t_pal = time.time() - t0
        ok = np.allclose(pal, reference, rtol=5e-3, atol=1e-4)
        print(
            f"  {'OK' if ok else 'MISMATCH'} ({t_pal:.2f}s, max diff vs ref "
            f"{np.abs(pal - reference).max():.2e}, vs XLA {np.abs(pal - xla).max():.2e})",
            flush=True,
        )
        failures += not ok
        # Steady-state timing comparison (readback-anchored: dispatch
        # alone is NOT a sync on this backend — see kernel_bench's
        # device_rate note).
        t0 = time.time()
        np.asarray(em_pallas_batched(probs, counts, masks, 1000, 0.001))
        t1 = time.time()
        np.asarray(em_abundances_batched(probs, counts, masks, 1000, 0.001)[0])
        t2 = time.time()
        print(f"  steady: pallas {t1 - t0:.3f}s, xla {t2 - t1:.3f}s", flush=True)
    except Exception as exc:
        print(f"  FAIL: {type(exc).__name__}: {str(exc)[:300]}", flush=True)
        failures += 1

    print("check: diploid pair scores ...", flush=True)
    import jax.numpy as jnp

    noise = rng.random(R).astype(np.float32) * 0.1 + 0.01
    log_freqs = np.log(np.full(C, 1.0 / C, dtype=np.float32))
    t0 = time.time()
    pair = np.asarray(
        _diploid_pair_scores(
            jnp.asarray(probs[0]), jnp.asarray(noise), jnp.asarray(counts[0]), jnp.asarray(log_freqs)
        )
    )
    half = probs[0].astype(np.float64) * 0.5
    group = noise[:, None, None].astype(np.float64) + half[:, :, None] + half[:, None, :]
    ref_pair = np.einsum("r,rij->ij", counts[0].astype(np.float64), np.log(group))
    ref_pair += log_freqs[:, None] + log_freqs[None, :]
    ok = np.allclose(pair, ref_pair, rtol=1e-3, atol=1e-2)
    print(f"  {'OK' if ok else 'MISMATCH'} ({time.time() - t0:.2f}s, max diff {np.abs(pair - ref_pair).max():.2e})", flush=True)
    failures += not ok

    if "--bench" in sys.argv:
        failures += kernel_bench()

    print(f"RESULT: {'PASS' if failures == 0 else f'{failures} FAILURES'}", flush=True)
    return 1 if failures else 0


# Public per-chip peaks for utilization reporting (How to Scale Your
# Model / cloud.google.com/tpu docs).  Keyed on device_kind prefixes.
_CHIP_PEAKS = {
    "TPU v5 lite": {"hbm_gbps": 819.0, "bf16_tflops": 197.0},
    "TPU v5e": {"hbm_gbps": 819.0, "bf16_tflops": 197.0},
    "TPU v4": {"hbm_gbps": 1228.0, "bf16_tflops": 275.0},
    "TPU v6 lite": {"hbm_gbps": 1640.0, "bf16_tflops": 918.0},
}


def _chip_peaks():
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        return None
    for prefix, peaks in _CHIP_PEAKS.items():
        if kind.startswith(prefix):
            return dict(peaks, device_kind=kind)
    return None


def kernel_bench() -> int:
    """Device-vs-host KERNEL throughput (independent of the e2e link
    economics): identical forced-iteration workloads through the Pallas
    EM, the XLA EM, the native C++ EM, and the diploid pair scorer —
    at a fixed reference shape AND the production bucket-shape mix the
    batcher emits (power-of-4 rows x power-of-2 cols,
    infer/batching.py).  Records the BASELINE.md "EM iterations/s per
    cluster batch" metric and bandwidth/FLOP utilization vs chip peaks.
    Writes TPU_KERNELS_<backend>.json next to the repo root."""
    import json

    import jax.numpy as jnp

    from rpvg_tpu.infer.batching import native_em_available, run_native_em
    from rpvg_tpu.infer.em import em_abundances_batched
    from rpvg_tpu.infer.posteriors import _diploid_pair_scores_batched
    from rpvg_tpu.ops.em_pallas import em_pallas_batched

    rng = np.random.default_rng(1)
    results = {"backend": jax.default_backend()}
    peaks = _chip_peaks()
    if peaks:
        results["chip"] = peaks

    # ---- EM: fixed 512 iterations (conv=0 never converges early), so
    # every engine does EXACTLY B*R*C*its element-updates.
    B, R, C, its = 64, 256, 64, 512
    probs = rng.random((B, R, C)).astype(np.float32)
    probs /= probs.sum(axis=2, keepdims=True)
    counts = rng.integers(1, 20, size=(B, R)).astype(np.float32)
    masks = np.ones((B, C), dtype=np.float32)
    updates = float(B) * R * C * its

    def best_of(fn, n=5):
        times = []
        for _ in range(n):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        return min(times)

    def device_rate(fn, n=8, n_lo=1):
        """On-device kernel timing, two-point chained-readback method:
        run k back-to-back executions ending in a 4-byte scalar
        readback (the device stream is serial, so the readback cannot
        complete before every queued kernel has), at k=n_lo and k=n,
        and divide the difference by (n - n_lo).  Readback latency,
        dispatch cost and compile time cancel in the subtraction.
        block_until_ready is NOT a valid sync on this tunnelled axon
        backend — it returns before execution completes (measured:
        a 67M-element log+reduce 'timed' at 12x the chip's physical
        HBM peak with it; 0.87x peak with this method), so every rate
        here is readback-anchored."""

        def run(k):
            out = None
            for _ in range(k):
                out = fn()
            leaf = jax.tree_util.tree_leaves(out)[-1]
            return float(jnp.sum(leaf))

        run(n_lo)  # warm + compile
        t_lo = []
        t_hi = []
        for _ in range(3):
            t0 = time.time()
            run(n_lo)
            t_lo.append(time.time() - t0)
            t0 = time.time()
            run(n)
            t_hi.append(time.time() - t0)
        return max(1e-9, (min(t_hi) - min(t_lo)) / (n - n_lo))

    print(f"bench: EM {B}x{R}x{C}, {its} forced iterations", flush=True)
    probs_d = jnp.asarray(probs)
    counts_d = jnp.asarray(counts)
    masks_d = jnp.asarray(masks)
    try:
        t = device_rate(
            lambda: em_pallas_batched(probs_d, counts_d, masks_d, its, 0.0),
            n=32,
        )
        results["em_pallas_geups"] = round(updates / t / 1e9, 2)
        print(f"  pallas EM: {t:.4f}s = {updates / t / 1e9:.2f} G element-updates/s (on-device)", flush=True)
    except Exception as exc:
        print(f"  pallas EM unavailable: {type(exc).__name__}", flush=True)
    from rpvg_tpu.infer.em import _em_solve_batched

    t = device_rate(
        lambda: _em_solve_batched(probs_d, counts_d, masks_d, jnp.int32(its), np.float32(0.0))[0],
        n=16,
    )
    results["em_xla_geups"] = round(updates / t / 1e9, 2)
    print(f"  XLA EM:    {t:.4f}s = {updates / t / 1e9:.2f} G element-updates/s (on-device)", flush=True)
    if native_em_available():
        native_inputs = [(probs[b].astype(np.float64), counts[b].astype(np.float64)) for b in range(B)]
        run_native_em(native_inputs, its, 0.0)
        t = best_of(lambda: run_native_em(native_inputs, its, 0.0), n=3)
        results["em_native_geups"] = round(updates / t / 1e9, 2)
        print(f"  native EM: {t:.4f}s = {updates / t / 1e9:.2f} G element-updates/s (all host cores)", flush=True)

    # BASELINE.md metric: EM iterations/s per cluster batch (the whole
    # padded batch advances one fixed-point iteration together), plus
    # utilization: the q-formulation touches each matrix element twice
    # per iteration (2 mul + 2 add = 4 FLOPs/element-update), so
    #   achieved FLOP/s          = 4 * updates / t
    #   HBM-equivalent bandwidth = what a kernel re-streaming the f32
    #     matrix from HBM every iteration would need; the Pallas kernel
    #     reads HBM once per cluster, so exceeding the HBM peak is the
    #     direct signature of the VMEM-resident design paying off.
    for engine in ("em_pallas", "em_xla"):
        if f"{engine}_geups" not in results:
            continue
        geups = results[f"{engine}_geups"]
        results[f"{engine}_iters_per_s"] = round(geups * 1e9 / (B * R * C), 1)
        results[f"{engine}_gflops"] = round(geups * 4, 1)
        results[f"{engine}_hbm_equiv_gbps"] = round(geups * 4, 1)  # 4 B/elem f32
        if peaks:
            results[f"{engine}_hbm_equiv_x_peak"] = round(
                geups * 4 / peaks["hbm_gbps"], 2
            )
    if "em_pallas_iters_per_s" in results:
        print(
            f"  EM iterations/s per {B}-cluster batch: "
            f"pallas {results['em_pallas_iters_per_s']:.0f}, "
            f"xla {results.get('em_xla_iters_per_s', 0):.0f}",
            flush=True,
        )

    # ---- Production bucket-shape mix: what the batcher actually emits
    # on the bench workload (rows padded to powers of 4, columns to
    # powers of 2; power-law cluster sizes mean many small buckets and
    # a few large ones).  Forced iterations as above.
    mix = [
        # (B, R, C): head-of-power-law big buckets .. small-cluster tail
        (8, 512, 128),
        (32, 128, 64),
        (128, 32, 32),
        (256, 8, 16),
    ]
    mix_updates = 0.0
    mix_t = {"pallas": 0.0, "xla": 0.0}
    print(f"bench: EM production shape mix {mix}, {its} forced iterations", flush=True)
    for Bm, Rm, Cm in mix:
        pm = rng.random((Bm, Rm, Cm)).astype(np.float32)
        pm /= pm.sum(axis=2, keepdims=True)
        cm = rng.integers(1, 20, size=(Bm, Rm)).astype(np.float32)
        mm = np.ones((Bm, Cm), dtype=np.float32)
        pm_d, cm_d, mm_d = jnp.asarray(pm), jnp.asarray(cm), jnp.asarray(mm)
        upd = float(Bm) * Rm * Cm * its
        mix_updates += upd
        try:
            t_p = device_rate(
                lambda: em_pallas_batched(pm_d, cm_d, mm_d, its, 0.0),
                n=16,
            )
            mix_t["pallas"] += t_p
        except Exception as exc:
            print(f"  pallas unavailable at {(Bm, Rm, Cm)}: {type(exc).__name__}", flush=True)
            t_p = None
        t_x = device_rate(
            lambda: _em_solve_batched(pm_d, cm_d, mm_d, jnp.int32(its), np.float32(0.0))[0],
            n=16,
        )
        mix_t["xla"] += t_x
        pal_s = f"pallas {upd / t_p / 1e9:7.2f}" if t_p else "pallas     n/a"
        print(
            f"  ({Bm:4d},{Rm:4d},{Cm:4d}): {pal_s}  xla {upd / t_x / 1e9:7.2f} GEUPS",
            flush=True,
        )
    if mix_t["pallas"] > 0:
        results["em_pallas_mix_geups"] = round(mix_updates / mix_t["pallas"] / 1e9, 2)
    results["em_xla_mix_geups"] = round(mix_updates / mix_t["xla"] / 1e9, 2)
    print(
        f"  mix aggregate: pallas {results.get('em_pallas_mix_geups', 0):.2f}"
        f" vs xla {results['em_xla_mix_geups']:.2f} GEUPS",
        flush=True,
    )

    # Fused multi-bucket launch: all four mix buckets resident in VMEM
    # at once, one shared fixed-point loop (ops/em_pallas.py
    # em_pallas_fused) — the dispatcher's answer to small buckets being
    # serial-chain bound.
    try:
        from rpvg_tpu.ops.em_pallas import em_pallas_fused

        blocks = []
        for Bm, Rm, Cm in mix:
            pm = rng.random((Bm, Rm, Cm)).astype(np.float32)
            pm /= pm.sum(axis=2, keepdims=True)
            cm = rng.integers(1, 20, size=(Bm, Rm)).astype(np.float32)
            blocks.append((jnp.asarray(pm), jnp.asarray(cm),
                           jnp.asarray(np.ones((Bm, Cm), np.float32))))
        t_f = device_rate(
            lambda: em_pallas_fused(blocks, its, 0.0),
            n=16,
        )
        results["em_pallas_fused_mix_geups"] = round(mix_updates / t_f / 1e9, 2)
        print(
            f"  fused single-launch mix: {mix_updates / t_f / 1e9:.2f} GEUPS "
            f"(vs {results.get('em_pallas_mix_geups', 0):.2f} per-bucket pallas, "
            f"{results['em_xla_mix_geups']:.2f} xla)",
            flush=True,
        )
    except Exception as exc:
        print(f"  fused mix unavailable: {type(exc).__name__}: {exc}", flush=True)

    # ---- Diploid pair scoring: (B,R,P) dense all-pairs, 2*B*R*P^2 FLOPs.
    Bp, Rp, P = 16, 256, 128
    pprobs = rng.random((Bp, Rp, P)).astype(np.float32)
    pnoise = (rng.random((Bp, Rp)) * 0.1 + 0.01).astype(np.float32)
    pcounts = rng.integers(1, 20, size=(Bp, Rp)).astype(np.float32)
    plf = np.log(np.full((Bp, P), 1.0 / P, dtype=np.float32))
    flops = 2.0 * Bp * Rp * P * P * 2  # group-sum + log/einsum passes
    args = tuple(jnp.asarray(x) for x in (pprobs, pnoise, pcounts, plf))
    t = device_rate(
        lambda: _diploid_pair_scores_batched(*args),
        n=64,
    )
    results["diploid_gflops"] = round(flops / t / 1e9, 1)
    if peaks:
        # MFU vs the chip's bf16 matmul peak (the kernel runs f32, so
        # its own ceiling is lower; the bf16 number is the honest
        # fixed reference point).
        results["diploid_mfu_vs_bf16_peak"] = round(
            flops / t / 1e12 / peaks["bf16_tflops"], 4
        )
    print(f"bench: diploid scoring {Bp}x{Rp}x{P}^2: {t:.4f}s = {flops / t / 1e9:.1f} GFLOP/s", flush=True)

    # Utilization story for the diploid kernel (the second-hottest
    # device kernel).  It is NOT MXU work (a log inside the reduction
    # blocks any matmul form) and NOT HBM-bound: the (B,R,P,P) pair
    # tensor is GENERATED on the fly from (B,R,P) inputs via the
    # outer-product broadcast, never streamed from HBM.  Two honest
    # figures:
    #  * HBM-equivalent bandwidth: what streaming the f32 pair tensor
    #    from HBM once would need — exceeding the chip's physical HBM
    #    peak is the fusion signature (same convention as the EM
    #    fields above).
    #  * Fraction of the measured log-generation roofline: the same
    #    broadcast + log + reduce structure stripped to its minimum
    #    (no noise add, no positivity select, no count weighting, no
    #    prior adds) — the practical ceiling for ANY kernel of this
    #    shape on this chip's transcendental unit.
    elements = float(Bp) * Rp * P * P
    results["diploid_elem_per_s_g"] = round(elements / t / 1e9, 1)
    results["diploid_hbm_equiv_gbps"] = round(elements * 4 / t / 1e9, 1)
    if peaks:
        results["diploid_hbm_equiv_x_peak"] = round(
            elements * 4 / t / 1e9 / peaks["hbm_gbps"], 2
        )

    half_d = jnp.asarray(pprobs) * 0.5

    @jax.jit
    def _log_roofline(h):
        pair = h[:, :, :, None] + h[:, :, None, :]
        return jnp.sum(jnp.log(pair), axis=1)

    t_roof = device_rate(lambda: _log_roofline(half_d), n=64)
    results["diploid_log_roofline_elem_per_s_g"] = round(
        elements / t_roof / 1e9, 1
    )
    results["diploid_frac_of_log_roofline"] = round(t_roof / t, 3)
    print(
        f"bench: diploid utilization: {elements / t / 1e9:.1f} G pair-elems/s = "
        f"HBM-equiv {elements * 4 / t / 1e9:.0f} GB/s"
        + (f" ({elements * 4 / t / 1e9 / peaks['hbm_gbps']:.2f}x physical peak)" if peaks else "")
        + f"; log-generation roofline {elements / t_roof / 1e9:.1f} G elems/s"
        f" -> kernel at {100 * t_roof / t:.0f}% of the bound",
        flush=True,
    )

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"TPU_KERNELS_{jax.default_backend()}.json",
    )
    with open(out_path, "w") as handle:
        json.dump(results, handle, indent=1)
    print(f"bench: wrote {out_path}", flush=True)
    return 0


if __name__ == "__main__":
    code = main()
    os._exit(code)
