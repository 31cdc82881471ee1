#!/usr/bin/env python
"""Benchmark: end-to-end quantification throughput on a synthetic
pantranscriptome (the reference's bundled example is 100k read pairs
over a 36,120-path panel at ~1,700 read-pairs/s on 4 CPU threads;
binary inputs are stripped from the snapshot, so an equivalent workload
is synthesised here).

Prints ONE JSON line:
  {"metric": "read_pairs_per_s", "value": N, "unit": "pairs/s",
   "vs_baseline": N / 1700}

Design notes:
* the measured section is the full pipeline (projection -> clustering ->
  probabilities -> batched EM on device -> outputs);
* the run executes in a child process with a hard timeout so a wedged
  accelerator tunnel cannot hang the driver; on timeout/failure it
  retries on the CPU backend and reports that result instead.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

BASELINE_PAIRS_PER_S = 1700.0

# Last healthy accelerator window, persisted across bench invocations:
# on this host the device tunnel wedges intermittently, so the
# end-of-round capture can land in a window with no live accelerator at
# all (round 4's driver artifact had no TPU number).  A healthy window
# recorded here is emitted as an explicitly `stale: true` entry when the
# capture-time probe fails — never as the headline.
STATE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_state.json")


def _load_state() -> dict:
    try:
        with open(STATE_PATH) as handle:
            return json.load(handle)
    except (OSError, ValueError):
        return {}


def _save_state(state: dict) -> None:
    try:
        tmp = STATE_PATH + ".tmp"
        with open(tmp, "w") as handle:
            json.dump(state, handle, indent=1, sort_keys=True)
        os.replace(tmp, STATE_PATH)
    except OSError:
        pass


def _workload_key(pairs: int, transcripts: int, qual: bool) -> str:
    return f"pairs={pairs},transcripts={transcripts},qual={qual}"


def make_dataset(num_pairs: int, num_transcripts: int, out_dir: str,
                 qual: bool = False) -> None:
    """Generate the reference-example-shaped dataset once (shared by
    every backend attempt): a four-haplotype GENE-STRUCTURED
    pantranscriptome with `haplotype-transcripts` inputs — the bundled
    example is 100k pairs over a 36,120-path whole-transcriptome panel.
    Isoforms of a gene share exon and allele nodes, so reads multimap
    across isoform x haplotype paths and clusters are power-law sized
    (hundreds of reads x dozens of paths at the head), matching the
    regime the reference's size-sorted cluster scheduling exists for;
    expression is a sparse Dirichlet over genes like real RNA-seq."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import pickle

    from rpvg_tpu import sim
    from rpvg_tpu.alignments import parse_multipath_alignment
    from rpvg_tpu.io import rpa
    from rpvg_tpu.native import native_available

    panel = sim.build_gene_panel(
        num_genes=max(1, round(num_transcripts / 7)),
        isoforms_per_gene=7,
        num_haplotypes=4,
        exons_per_gene=10,
        exon_length=120,
        variant_sites=3,
        seed=5,
    )
    # `qual` = the reference's DEFAULT regime (quality-adjusted scoring,
    # src/main.cpp:385): quality-driven sequencing errors + per-base
    # qualities + GSSW qual-adjusted scores.
    # Multipath subpath DAGs over the variant bubbles: reads crossing a
    # site carry scored alternatives for every allele, like real mpmap
    # output — the multipath DFS machinery runs at full scale.
    records, _ = sim.simulate_read_pairs(
        panel, num_pairs, read_length=100, frag_mean=250, frag_sd=25, seed=17,
        abundances=sim.gene_abundances(panel, seed=7), with_errors=qual,
        multipath_dag=True,
    )

    sim.write_alignment_json(records, os.path.join(out_dir, "bench_aln.json"))
    if native_available():
        alns = [parse_multipath_alignment(r) for r in records]
        pairs = list(zip(alns[0::2], alns[1::2]))
        rpa.write_fragments(
            os.path.join(out_dir, "bench_aln.rpa"), pairs,
            is_multipath=True, is_paired=True, frag_mean=250.0, frag_sd=25.0,
        )
    panel.write_info_tsv(os.path.join(out_dir, "bench_info.tsv"))
    with open(os.path.join(out_dir, "panel.pkl"), "wb") as handle:
        pickle.dump(panel, handle)


def run_workload(num_pairs: int, num_transcripts: int, data_dir: str,
                 qual: bool = False, runs: int = 10) -> dict:
    """Measure the pipeline end-to-end from prebuilt binary inputs,
    exactly as the reference measures from its prebuilt .gamp."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import multiprocessing
    import pickle

    from rpvg_tpu.pipeline import PipelineConfig, run_pipeline

    with open(os.path.join(data_dir, "panel.pkl"), "rb") as handle:
        panel = pickle.load(handle)

    rpa_path = os.path.join(data_dir, "bench_aln.rpa")
    aln_path = rpa_path if os.path.exists(rpa_path) else os.path.join(
        data_dir, "bench_aln.json"
    )

    config = PipelineConfig(
        graph=panel.graph,
        paths=panel.paths_index,
        alignments=aln_path,
        output_prefix=os.path.join(data_dir, "bench_out"),
        inference_model="haplotype-transcripts",
        path_info=os.path.join(data_dir, "bench_info.tsv"),
        threads=min(8, multiprocessing.cpu_count()),
        rng_seed=42,
        score_not_qual=not qual,
    )

    # Ten runs, best kept: the first pays one-time jit
    # tracing/compiles (amortised away in production by the persistent
    # XLA compile cache), the rest measure steady state — best-of damps
    # the +-30% burst noise observed on small shared hosts (three runs
    # proved too few: one noisy burst can still cover all of them; at
    # ~2s per run, ten runs are cheap insurance).
    elapsed = []
    for _ in range(runs):
        start = time.perf_counter()
        stats = run_pipeline(config)
        elapsed.append(time.perf_counter() - start)

    import jax

    result = {
        "num_pairs": num_pairs,
        "elapsed_s": min(elapsed),
        "cold_elapsed_s": elapsed[0],
        "pairs_per_s": num_pairs / min(elapsed),
        "num_clusters": stats["num_clusters"],
        "num_fragment_lists": stats["num_fragment_lists"],
        "backend": jax.default_backend(),
    }
    if jax.default_backend() != "cpu":
        # Record the measured device link: the hybrid routing policy's
        # inputs (parallel/linkprobe.py), and the physical reason the
        # backends tie when the link is orders of magnitude below host
        # memory bandwidth (see ROADMAP round 3).
        try:
            from rpvg_tpu.parallel.linkprobe import probe_link

            link = probe_link()
            if link:
                result["link_h2d_mbps"] = round(link["h2d_bps"] / 1e6, 1)
                result["link_dispatch_ms"] = round(link["dispatch_s"] * 1e3, 2)
        except Exception:
            pass
    return result


def child_main() -> None:
    if os.environ.get("RPVG_TPU_FORCE_CPU") == "1":
        # Env-based platform selection is overridden by the host's jax
        # site bootstrap; the config update is authoritative.
        import jax

        jax.config.update("jax_platforms", "cpu")
    args = json.loads(sys.argv[2])
    result = run_workload(
        args["num_pairs"], args["num_transcripts"], args["data_dir"],
        qual=args.get("qual", False), runs=args.get("runs", 10),
    )
    print(json.dumps(result), flush=True)
    os._exit(0)  # skip accelerator teardown (tunnel hangs on exit)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--pairs", type=int, default=100000)
    parser.add_argument("--transcripts", type=int, default=9000)
    parser.add_argument("--timeout", type=float, default=600.0)
    # The accelerator tunnel takes ~80-90s just to initialise the backend
    # on this host, and wedges intermittently.  The probe starts BEFORE
    # dataset generation and runs concurrently with it and the CPU
    # windows, so a healthy device costs nothing and a wedged tunnel
    # costs at most the residual budget (round-3 runs burned 375s in
    # serial probe timeouts before falling back to CPU).
    parser.add_argument("--probe-budget", type=float, default=150.0)
    parser.add_argument(
        "--skip-forced-device", action="store_true",
        help="skip the forced-device diagnostic window",
    )
    parser.add_argument(
        "--qual", action="store_true",
        help="reference-default regime: quality-driven sequencing errors "
        "with quality-adjusted scoring (score_not_qual=False)",
    )
    args = parser.parse_args()

    # Persistent XLA compile cache: repeat runs skip the 20-40s compiles.
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(tempfile.gettempdir(), "rpvg_tpu_xla_cache"),
    )

    probe_src = (
        "import jax, jax.numpy as jnp, os\n"
        "assert jax.default_backend() != 'cpu'\n"
        "x = jnp.ones((128, 128), jnp.float32)\n"
        "print(float((x @ x).sum()))\n"
        "os._exit(0)\n"
    )

    class DeviceProbe:
        """Accelerator health check overlapped with the CPU-side work."""

        def __init__(self, budget_s: float):
            self.deadline = time.monotonic() + budget_s
            self.proc = self._start()
            self.verdict = None
            self.attempts = 1
            self.retried = False

        def retry_once(self, budget_s: float) -> None:
            """One mid-run second chance after the CPU windows: a tunnel
            that was wedged at process start is sometimes back minutes
            later, and the CPU windows have already paid the wall time."""
            if self.retried or self.verdict is not False:
                return
            self.retried = True
            print("bench: retrying device probe mid-run", file=sys.stderr)
            self.deadline = time.monotonic() + budget_s
            self.proc = self._start()
            self.verdict = None
            self.attempts = 1

        def _start(self):
            return subprocess.Popen(
                [sys.executable, "-c", probe_src],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )

        def healthy(self) -> bool:
            """Blocks (only when first consulted) until the probe
            resolves or the wall budget runs out."""
            while self.verdict is None:
                remaining = self.deadline - time.monotonic()
                if remaining <= 0:
                    self.proc.kill()
                    print(
                        "bench: device probe budget exhausted; "
                        "skipping accelerator windows",
                        file=sys.stderr,
                    )
                    self.verdict = False
                    break
                try:
                    rc = self.proc.wait(timeout=remaining)
                except subprocess.TimeoutExpired:
                    continue
                if rc == 0:
                    self.verdict = True
                elif self.attempts < 3 and self.deadline - time.monotonic() > 5.0:
                    # A fast deterministic failure (no accelerator at
                    # all) must not respawn probes for the whole budget
                    # — the churn competes with the CPU windows this
                    # bench is measuring.
                    self.attempts += 1
                    print(
                        f"bench: device probe failed (rc={rc}); retrying",
                        file=sys.stderr,
                    )
                    self.proc = self._start()
                else:
                    self.verdict = False
            return self.verdict

    probe = DeviceProbe(args.probe_budget)

    data_dir = tempfile.mkdtemp(prefix="rpvg_bench_")
    print(f"bench: generating dataset ({args.pairs} pairs) ...", file=sys.stderr)
    make_dataset(args.pairs, args.transcripts, data_dir, qual=args.qual)

    payload = json.dumps(
        {
            "num_pairs": args.pairs,
            "num_transcripts": args.transcripts,
            "data_dir": data_dir,
            "qual": args.qual,
        }
    )

    def attempt(extra_env, child_payload=None, timeout_s=None):
        env = dict(os.environ)
        env.update(extra_env)
        try:
            proc = subprocess.run(
                [
                    sys.executable, os.path.abspath(__file__), "--child",
                    child_payload or payload,
                ],
                capture_output=True,
                text=True,
                timeout=timeout_s or args.timeout,
                env=env,
            )
        except subprocess.TimeoutExpired:
            return None, "timeout"
        if proc.returncode != 0:
            return None, proc.stderr[-2000:]
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                return json.loads(line), None
            except json.JSONDecodeError:
                continue
        return None, "no result line"

    # Measure every available backend configuration; the headline is the
    # fastest backend, full stop.  Children run in ALTERNATING windows
    # (cpu, tpu, cpu, tpu) with the per-backend best kept: both backends
    # share the same host pipeline, so slow drift on a bursty shared
    # host would otherwise bias whichever backend's single window landed
    # quieter.  The first window additionally pays cold file/page
    # caches, a bias alternation also spreads across both backends.
    best = {}

    # Accelerator windows run under a tighter cap than CPU windows: the
    # child needs ~90s backend init + ~60s of measurement, so 300s is
    # generous — while a tunnel that wedges MID-RUN (after a healthy
    # probe) must not burn the full CPU-window budget per attempt.
    tpu_window_timeout = min(args.timeout, 300.0)

    def record(backend, extra_env, retry=0):
        timeout_s = tpu_window_timeout if backend != "cpu" else None
        result, err = attempt(extra_env, timeout_s=timeout_s)
        while result is None and retry > 0:
            retry -= 1
            print(f"bench: {backend} window failed ({err}); retrying", file=sys.stderr)
            result, err = attempt(extra_env, timeout_s=timeout_s)
        if result is None:
            print(f"bench: {backend} window failed ({err})", file=sys.stderr)
            if backend != "cpu" and err == "timeout":
                # The tunnel wedged after a healthy probe: pronounce it
                # dead so later accelerator windows (and the
                # forced-device diagnostic) skip instead of burning
                # their own timeouts.
                probe.verdict = False
            return
        # Trust the child's SELF-REPORTED backend: the in-child guard
        # (rpvg_tpu/backend.py) can flip a wedged-tunnel run to CPU and
        # complete — recording that CPU-speed figure as a healthy
        # accelerator window (or persisting it to the state file) would
        # poison the exact artifact the state mechanism keeps honest.
        child_backend = result.get("backend") or backend
        if child_backend != backend:
            print(
                f"bench: {backend} window fell back to {child_backend} "
                "in-child (backend guard); recording under the actual backend",
                file=sys.stderr,
            )
            # Same tunnel-wedge signal as the timeout branch above:
            # later accelerator windows (and the forced-device
            # diagnostic) should skip instead of re-attempting.
            probe.verdict = False
            backend = child_backend
        result["backend"] = backend
        if backend not in best or result["pairs_per_s"] > best[backend]["pairs_per_s"]:
            best[backend] = result
        if backend != "cpu":
            # Persist the healthy accelerator window so a later capture
            # whose probe fails can still report it (marked stale).
            # Keep the BETTER of the stored and new windows unless the
            # stored one has aged out (>6h): within a run, later
            # windows land on noisier host states and must not
            # overwrite the run's best; across runs, recency wins.
            state = _load_state()
            wkey = _workload_key(args.pairs, args.transcripts, args.qual)
            existing = state.get(backend, {}).get(wkey)
            fresh = (
                existing is not None
                and time.time() - existing.get("recorded_unix", 0) < 6 * 3600
            )
            if fresh and existing.get("pairs_per_s", 0) >= result["pairs_per_s"]:
                return
            entry = {
                "pairs_per_s": round(result["pairs_per_s"], 2),
                "elapsed_s": round(result["elapsed_s"], 3),
                "recorded_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "recorded_unix": int(time.time()),
            }
            for key in ("link_h2d_mbps", "link_dispatch_ms"):
                if key in result:
                    entry[key] = result[key]
            state.setdefault(backend, {})[wkey] = entry
            _save_state(state)

    for window in range(2):
        record("cpu", {"RPVG_TPU_FORCE_CPU": "1"})
        # probe.healthy() blocks at most until the probe budget runs
        # out, and only before the first accelerator window — the probe
        # has been running since before dataset generation.  After the
        # first full window pair the probe gets ONE mid-run second
        # chance: a transiently wedged tunnel is often back by then.
        if window > 0:
            probe.retry_once(min(args.probe_budget, 90.0))
        if probe.healthy():
            # One retry on the first window: transient tunnel wedges are
            # the common failure.
            record("tpu", {}, retry=1 if window == 0 else 0)

    # Forced-device diagnostic (not a headline candidate): route ALL
    # inference to the accelerator (RPVG_TPU_HYBRID_EM_AREA=0 disables
    # the hybrid, RPVG_TPU_HYBRID_DIPLOID_WORK=0 sends diploid scoring
    # too) — the measured cost of the path the linkprobe policy
    # declines on this link, recorded so "the policy routes to host" is
    # a quantified trade rather than an assertion.
    forced = None
    if not args.skip_forced_device and probe.healthy():
        forced_payload = json.dumps(
            {
                "num_pairs": args.pairs,
                "num_transcripts": args.transcripts,
                "data_dir": data_dir,
                "qual": args.qual,
                "runs": 3,
            }
        )
        forced, err = attempt(
            {
                "RPVG_TPU_HYBRID_EM_AREA": "0",
                "RPVG_TPU_HYBRID_DIPLOID_WORK": "0",
            },
            child_payload=forced_payload,
            timeout_s=tpu_window_timeout,
        )
        if forced is None:
            print(f"bench: forced-device window failed ({err})", file=sys.stderr)
        else:
            print(
                f"bench: forced-device (all inference on accelerator): "
                f"{forced['pairs_per_s']:.1f} pairs/s",
                file=sys.stderr,
            )

    import shutil

    shutil.rmtree(data_dir, ignore_errors=True)

    candidates = list(best.values())
    if not candidates:
        return 1
    result = max(candidates, key=lambda r: r["pairs_per_s"])

    for key, value in sorted(result.items()):
        print(f"bench: {key} = {value}", file=sys.stderr)

    value = result["pairs_per_s"]
    out = {
        "metric": "read_pairs_per_s",
        "value": round(value, 2),
        "unit": "pairs/s",
        "vs_baseline": round(value / BASELINE_PAIRS_PER_S, 4),
        "backend": result["backend"],
        "all_backends": {
            c["backend"]: round(c["pairs_per_s"], 2) for c in candidates
        },
    }
    if "tpu" not in out["all_backends"]:
        # No live accelerator window this capture: surface the last
        # healthy one for this exact workload, explicitly marked stale
        # (it is informational, never the headline — `value`/`backend`
        # above come from live windows only).
        stale = _load_state().get("tpu", {}).get(
            _workload_key(args.pairs, args.transcripts, args.qual)
        )
        if stale:
            entry = {"pairs_per_s": stale["pairs_per_s"], "stale": True}
            entry["recorded_at"] = stale.get("recorded_at")
            if stale.get("recorded_unix"):
                entry["age_hours"] = round(
                    (time.time() - stale["recorded_unix"]) / 3600.0, 1
                )
            for key in ("link_h2d_mbps", "link_dispatch_ms"):
                if key in stale:
                    entry[key] = stale[key]
            out["all_backends"]["tpu"] = entry
            print(
                f"bench: no live tpu window; reporting last healthy one "
                f"({stale['pairs_per_s']} pairs/s, {entry.get('recorded_at')}) "
                f"marked stale",
                file=sys.stderr,
            )
    if len(candidates) > 1:
        # Honest tie marker (NOT a headline adjustment — the headline is
        # still the measured fastest backend): on a tunnel-attached
        # accelerator the measured-link policy routes the EM work to the
        # host on BOTH backends (see device_link below and ROADMAP), so
        # the backends run identical host code and the winner of any
        # single roll is host noise.
        lo = min(c["pairs_per_s"] for c in candidates)
        hi = max(c["pairs_per_s"] for c in candidates)
        out["backend_spread_pct"] = round(100.0 * (hi - lo) / hi, 2)
        out["tie_within_noise"] = bool((hi - lo) / hi < 0.05)
    for cand in candidates:
        if "link_h2d_mbps" in cand:
            out["device_link"] = {
                "h2d_mbps": cand["link_h2d_mbps"],
                "dispatch_ms": cand["link_dispatch_ms"],
            }
    if forced is not None:
        out["forced_device"] = {
            "pairs_per_s": round(forced["pairs_per_s"], 2),
            "elapsed_s": round(forced["elapsed_s"], 3),
            "runs": 3,
            "env": {
                "RPVG_TPU_HYBRID_EM_AREA": "0",
                "RPVG_TPU_HYBRID_DIPLOID_WORK": "0",
            },
        }
        if "link_h2d_mbps" in forced:
            out["forced_device"]["link"] = {
                "h2d_mbps": forced["link_h2d_mbps"],
                "dispatch_ms": forced["link_dispatch_ms"],
            }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child_main()
    else:
        code = main()
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(code)  # skip any accelerator teardown
