#!/usr/bin/env python
"""End-to-end A/B of the fused-EM launch policy through the device link.

The fused multi-bucket Pallas launch is kernel-time neutral (~102.9 vs
102.4 GEUPS at the production mix, TPU_KERNELS_tpu.json); its claimed
value is the (K-1) saved dispatches through a high-latency link — the
">1 ms dispatch => fuse" gate at rpvg_tpu/infer/batching.py.  This tool
measures that end to end: the bench workload with ALL cluster EM routed
to the device (RPVG_TPU_HYBRID_EM_AREA=0 — the only configuration where
the fusion gate fires; the production routing policy keeps EM on host
over this tunnel) under RPVG_TPU_FUSE_EM=1 vs =0, in alternating
windows with per-arm best kept.

Writes FUSE_AB_r05.json.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--pairs", type=int, default=100000)
    parser.add_argument("--transcripts", type=int, default=9000)
    parser.add_argument("--runs", type=int, default=3)
    parser.add_argument("--windows", type=int, default=2)
    parser.add_argument("--timeout", type=float, default=420.0)
    args = parser.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(tempfile.gettempdir(), "rpvg_tpu_xla_cache"),
    )

    import bench

    data_dir = tempfile.mkdtemp(prefix="rpvg_fuseab_")
    print(f"fuse_ab: generating dataset ({args.pairs} pairs) ...", file=sys.stderr)
    bench.make_dataset(args.pairs, args.transcripts, data_dir)

    payload = json.dumps(
        {
            "num_pairs": args.pairs,
            "num_transcripts": args.transcripts,
            "data_dir": data_dir,
            "runs": args.runs,
        }
    )

    def run_arm(fuse: str):
        env = dict(os.environ)
        env.update(
            {
                "RPVG_TPU_HYBRID_EM_AREA": "0",
                "RPVG_TPU_FUSE_EM": fuse,
            }
        )
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"), "--child", payload],
                capture_output=True, text=True, timeout=args.timeout, env=env,
            )
        except subprocess.TimeoutExpired:
            return None, "timeout"
        if proc.returncode != 0:
            return None, proc.stderr[-1500:]
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                return json.loads(line), None
            except json.JSONDecodeError:
                continue
        return None, "no result line"

    best = {}
    for window in range(args.windows):
        for fuse in ("1", "0"):
            result, err = run_arm(fuse)
            if result is None:
                print(f"fuse_ab: window {window} fuse={fuse} failed: {err}",
                      file=sys.stderr)
                continue
            print(
                f"fuse_ab: window {window} fuse={fuse}: "
                f"{result['pairs_per_s']:.1f} pairs/s "
                f"({result['elapsed_s']:.3f}s best of {args.runs})",
                file=sys.stderr,
            )
            key = f"fuse_{fuse}"
            if key not in best or result["pairs_per_s"] > best[key]["pairs_per_s"]:
                best[key] = result

    import shutil

    shutil.rmtree(data_dir, ignore_errors=True)

    if "fuse_1" not in best or "fuse_0" not in best:
        print("fuse_ab: missing an arm; no artifact written", file=sys.stderr)
        return 1

    on, off = best["fuse_1"], best["fuse_0"]
    out = {
        "metric": "fused_em_launch_e2e_ab",
        "config": {
            "workload": f"{args.pairs} pairs x {args.transcripts} transcripts, "
                        "haplotype-transcripts",
            "env": "RPVG_TPU_HYBRID_EM_AREA=0 (all cluster EM on device; the "
                   "only configuration where the fusion gate fires — the "
                   "production link policy keeps EM on host over this tunnel)",
            "protocol": f"alternating windows x{args.windows}, best-of-{args.runs} "
                        "per window per arm, per-arm best kept",
        },
        "fuse_on": {
            "pairs_per_s": round(on["pairs_per_s"], 2),
            "elapsed_s": round(on["elapsed_s"], 3),
            "backend": on.get("backend"),
            "link_h2d_mbps": on.get("link_h2d_mbps"),
            "link_dispatch_ms": on.get("link_dispatch_ms"),
        },
        "fuse_off": {
            "pairs_per_s": round(off["pairs_per_s"], 2),
            "elapsed_s": round(off["elapsed_s"], 3),
            "backend": off.get("backend"),
            "link_h2d_mbps": off.get("link_h2d_mbps"),
            "link_dispatch_ms": off.get("link_dispatch_ms"),
        },
        "speedup_e2e": round(on["pairs_per_s"] / off["pairs_per_s"], 4),
        "recorded_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(os.path.join(REPO, "FUSE_AB_r05.json"), "w") as handle:
        json.dump(out, handle, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    code = main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(code)
