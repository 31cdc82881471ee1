#!/usr/bin/env python
"""Worker-scaling benchmark: whole pipeline AND fragment pass.

BASELINE.md's scaling contract (mirroring the reference's multi-host
story: reads data-parallel, index replicated) is >=80% efficiency at
2+ workers.  This harness runs ``run_pipeline_multiprocess`` at
1/2/4 workers on the bench workload — the N-worker configuration owns
N cores END TO END (the fragment pass as N worker processes, the
downstream native phases as N threads, matching the reference running
everything under -t N) — and prints one JSON line with BOTH the
whole-pipeline numbers (startup included, also reported separately)
and the fragment-scan critical path:

  {"metric": "e2e_scaling", "workers": [...], "e2e_s": [...],
   "e2e_pairs_per_s": [...], "e2e_efficiency": [...],
   "startup_s": [...], "e2e_excl_startup_s": [...],
   "e2e_excl_startup_efficiency": [...],
   "fragment_scan_s": [...], "fragment_scan_efficiency": [...]}

Each configuration runs in a fresh child process on the CPU backend
(scaling here is a host-process property; the device back half is
byte-identical at any worker count — tests/test_multihost.py).
Best-of-N per configuration damps the +-30% shared-host noise.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile


def child_main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    args = json.loads(sys.argv[2])
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import pickle
    import time

    from rpvg_tpu.parallel.multihost import run_pipeline_multiprocess
    from rpvg_tpu.pipeline import PipelineConfig

    with open(os.path.join(args["data_dir"], "panel.pkl"), "rb") as handle:
        panel = pickle.load(handle)

    rpa_path = os.path.join(args["data_dir"], "bench_aln.rpa")
    aln = rpa_path if os.path.exists(rpa_path) else os.path.join(
        args["data_dir"], "bench_aln.json"
    )
    config = PipelineConfig(
        graph=panel.graph,
        paths=panel.paths_index,
        alignments=aln,
        output_prefix=os.path.join(args["data_dir"], f"scale_out_{args['workers']}"),
        inference_model="haplotype-transcripts",
        path_info=os.path.join(args["data_dir"], "bench_info.tsv"),
        threads=args["workers"],  # N cores end to end (reference: -t N)
        rng_seed=42,
        score_not_qual=True,
    )

    best = None
    for _ in range(args["repeats"]):
        start = time.perf_counter()
        stats = run_pipeline_multiprocess(config, args["workers"])
        e2e = time.perf_counter() - start
        row = {
            "fragment_scan_s": stats["fragment_scan_s"],
            "fragment_pass_s": stats["fragment_pass_s"],
            "merge_s": stats.get("merge_s", 0.0),
            "inference_s": stats.get("inference_s", 0.0),
            "e2e_s": e2e,
        }
        if best is None or row["e2e_s"] < best["e2e_s"]:
            best = row
    print(json.dumps(best), flush=True)
    os._exit(0)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--pairs", type=int, default=200000)
    parser.add_argument("--transcripts", type=int, default=4000)
    parser.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4])
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--timeout", type=float, default=900.0)
    parser.add_argument(
        "--data-dir", default=None,
        help="reuse a prebuilt dataset dir (skips generation and cleanup)",
    )
    args = parser.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(tempfile.gettempdir(), "rpvg_tpu_xla_cache"),
    )

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if args.data_dir:
        data_dir = args.data_dir
    else:
        data_dir = tempfile.mkdtemp(prefix="rpvg_scale_")
        print(f"scaling: generating dataset ({args.pairs} pairs) ...", file=sys.stderr)
        import bench

        bench.make_dataset(args.pairs, args.transcripts, data_dir)

    rows = []
    for workers in args.workers:
        payload = json.dumps(
            {"data_dir": data_dir, "workers": workers, "repeats": args.repeats}
        )
        env = dict(os.environ)
        env["RPVG_TPU_FORCE_CPU"] = "1"
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", payload],
            capture_output=True,
            text=True,
            timeout=args.timeout,
            env=env,
        )
        if proc.returncode != 0:
            print(proc.stderr[-2000:], file=sys.stderr)
            return 1
        row = json.loads(proc.stdout.strip().splitlines()[-1])
        row["workers"] = workers
        rows.append(row)
        print(
            f"scaling: {workers} worker(s): fragment scan "
            f"{row['fragment_scan_s']:.2f}s (pass incl. startup "
            f"{row['fragment_pass_s']:.2f}s), e2e {row['e2e_s']:.2f}s",
            file=sys.stderr,
        )

    if not args.data_dir:
        import shutil

        shutil.rmtree(data_dir, ignore_errors=True)

    scan_base = rows[0]["fragment_scan_s"] * rows[0]["workers"]
    e2e_base = rows[0]["e2e_s"] * rows[0]["workers"]
    for r in rows:
        # Per-worker startup (interpreter spawn + index build): the
        # sharded pass wall time minus its scan critical path.
        r["startup_s"] = r["fragment_pass_s"] - r["fragment_scan_s"]
        r["e2e_excl_startup_s"] = r["e2e_s"] - r["startup_s"]
    excl_base = rows[0]["e2e_excl_startup_s"] * rows[0]["workers"]
    result = {
        "metric": "e2e_scaling",
        "pairs": args.pairs,
        "workers": [r["workers"] for r in rows],
        "e2e_s": [round(r["e2e_s"], 2) for r in rows],
        "e2e_pairs_per_s": [round(args.pairs / r["e2e_s"], 1) for r in rows],
        "e2e_efficiency": [
            round(e2e_base / (r["workers"] * r["e2e_s"]), 4) for r in rows
        ],
        "startup_s": [round(r["startup_s"], 2) for r in rows],
        "e2e_excl_startup_s": [round(r["e2e_excl_startup_s"], 2) for r in rows],
        "e2e_excl_startup_efficiency": [
            round(excl_base / (r["workers"] * r["e2e_excl_startup_s"]), 4)
            for r in rows
        ],
        "fragment_scan_s": [round(r["fragment_scan_s"], 3) for r in rows],
        "fragment_scan_efficiency": [
            round(scan_base / (r["workers"] * r["fragment_scan_s"]), 4) for r in rows
        ],
        # Honest serial-tail breakdown: cross-shard merge and the
        # downstream inference phase (native threaded kernels + serial
        # Python orchestration) per worker count.
        "merge_s": [round(r["merge_s"], 3) for r in rows],
        "inference_s": [round(r["inference_s"], 3) for r in rows],
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child_main()
    else:
        code = main()
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(code)
