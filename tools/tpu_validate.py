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
        # Steady-state timing comparison.
        t0 = time.time(); em_pallas_batched(probs, counts, masks, 1000, 0.001); t1 = time.time()
        em_abundances_batched(probs, counts, masks, 1000, 0.001); t2 = time.time()
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

    print(f"RESULT: {'PASS' if failures == 0 else f'{failures} FAILURES'}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    code = main()
    os._exit(code)
