"""Guarded accelerator-backend selection: one probe, CPU fallback.

The reference binary cannot lose its compute device mid-run — its
inference loop is unconditional host code (reference
src/main.cpp:827-998).  The TPU build can: JAX initializes the PJRT
backend lazily, so the FIRST ``jax.default_backend()`` touch happens
deep inside inference, AFTER the fragment pass has already spent
minutes.  Under an explicitly pinned platform (``JAX_PLATFORMS=axon``
on this host) a wedged device tunnel makes that first touch either
raise ``RuntimeError: Unable to initialize backend`` or hang.  Round 4
shipped 13 call sites that would die there with a raw traceback and
partial output files on disk.

This module is the single backend authority for the production path:

* :func:`safe_default_backend` — cached.  Wraps the first backend touch
  in try/except; on failure it flips the process to the CPU platform
  (``jax.config jax_platforms="cpu"`` — re-discovery succeeds because
  JAX caches nothing on a failed init, xla_bridge.backends leaves
  ``_backends`` empty when it raises) and emits ONE stderr warning.
  All former ``jax.default_backend()`` decision points route here.
* :func:`start_probe` — subprocess probe with a hard timeout, covering
  the HANG case (an in-process hang is unrecoverable: no amount of
  try/except helps once the interpreter is stuck inside PJRT init).
  The pipeline starts it at run() entry so the probe's wall time hides
  under the fragment pass; the first :func:`safe_default_backend` call
  joins it and, if the probe failed or timed out, flips to CPU BEFORE
  any in-process backend init.

The probe only runs when the environment pins a non-CPU platform
(without pinning, JAX itself falls back to CPU quietly) and the
in-process backend has not already been initialized.

Env:
  RPVG_TPU_BACKEND_PROBE_S  probe timeout in seconds (default 150 — the
                            tunnel needs ~80-90s of backend init when
                            HEALTHY, so a smaller budget would
                            misclassify a healthy device as dead and
                            silently force CPU; "0" disables the
                            subprocess probe, leaving only the
                            in-process try/except guard)
  RPVG_TPU_FORCE_BACKEND    skip probing entirely and pin the named
                            platform (tests / --backend flag)
"""

from __future__ import annotations

import os
import subprocess
import sys
import threading
from typing import Optional

_LOCK = threading.Lock()
_BACKEND: Optional[str] = None
_PROBE: Optional[threading.Thread] = None
_PROBE_OK: Optional[bool] = None
_PROBE_DETAIL: str = ""
_PROBE_ELAPSED: Optional[float] = None
_WARNED = False
# Re-exec recovery target for a hung IN-PROCESS backend init (the
# probe-passed-then-tunnel-wedged TOCTOU): registered by the CLI so the
# watchdog can restart the whole run pinned to CPU.  Library callers
# that never register simply keep the historical behavior (wait).
_EXEC_ARGV: Optional[list] = None

_PROBE_SRC = (
    "import jax\n"
    "b = jax.default_backend()\n"
    "import jax.numpy as jnp\n"
    "jnp.zeros(1).block_until_ready()\n"
    "print(b)\n"
)


def _probe_timeout_s() -> float:
    try:
        return float(os.environ.get("RPVG_TPU_BACKEND_PROBE_S", "150"))
    except ValueError:
        return 150.0


def _init_timeout_s() -> float:
    """Watchdog budget for the IN-PROCESS backend init (healthy init on
    this host's tunnel takes ~80-90s; see RPVG_TPU_INIT_TIMEOUT_S).
    <= 0 disables the watchdog, like the sibling knobs."""
    try:
        return float(os.environ.get("RPVG_TPU_INIT_TIMEOUT_S", "240"))
    except ValueError:
        return 240.0


def register_exec_argv(argv: list) -> None:
    """Register the argv that re-launches this run (CLI entry).  Enables
    the last-resort recovery for a backend init that HANGS after the
    subprocess probe passed — the tunnel can wedge in the seconds
    between the probe's healthy verdict and the in-process init, and a
    hang inside PJRT init holds xla_bridge's lock forever, poisoning
    every later jax call in this process.  The only clean recovery is
    re-exec with the platform pinned to CPU."""
    global _EXEC_ARGV
    _EXEC_ARGV = list(argv)


def _touch_backend_with_watchdog() -> str:
    """First in-process backend touch under a watchdog thread.  On a
    hang: re-exec pinned to CPU when the CLI registered an argv, else
    warn loudly and keep waiting (a library caller's process cannot be
    silently replaced)."""
    result: dict = {}
    done = threading.Event()

    def _touch():
        try:
            import jax

            result["backend"] = jax.default_backend()
        except Exception as exc:  # raise-style failure: normal fallback
            result["error"] = exc
        done.set()

    toucher = threading.Thread(
        target=_touch, name="rpvg-backend-init", daemon=True
    )
    toucher.start()
    budget = _init_timeout_s()
    if budget <= 0:
        done.wait()
    elif not done.wait(timeout=budget):
        if _EXEC_ARGV is not None and os.environ.get("RPVG_TPU_EXEC_DEPTH") != "1":
            print(
                "WARNING: accelerator backend init hung past "
                f"{budget:.0f}s (tunnel wedged after a healthy "
                "probe); restarting this run on the CPU backend",
                file=sys.stderr,
            )
            sys.stdout.flush()
            sys.stderr.flush()
            os.environ["JAX_PLATFORMS"] = "cpu"
            os.environ["RPVG_TPU_FORCE_BACKEND"] = "cpu"
            os.environ["RPVG_TPU_EXEC_DEPTH"] = "1"
            os.execv(_EXEC_ARGV[0], _EXEC_ARGV)
        _warn_once(
            "accelerator backend init appears hung and no restart argv is "
            "registered; waiting (export RPVG_TPU_FORCE_BACKEND=cpu or "
            "JAX_PLATFORMS=cpu to avoid the accelerator entirely)"
        )
        done.wait()
    if "error" in result:
        raise result["error"]
    return result["backend"]


def _pinned_non_cpu() -> bool:
    """True when the effective configuration pins a non-CPU JAX platform
    (the configuration where a dead accelerator is a hard error rather
    than a quiet CPU fallback).

    The in-process ``jax.config`` is AUTHORITATIVE over the ambient env
    var: a process that deliberately ran
    ``jax.config.update("jax_platforms", "cpu")`` (bench CPU windows,
    tests, the verify recipe) must not probe the accelerator — the env
    var often still says the site default.  The config is only
    consulted when jax is already imported; importing it here would
    defeat the lazy-probe design."""
    jax = sys.modules.get("jax")
    if jax is not None:
        try:
            value = jax.config.jax_platforms
            if value:
                return value.lower() != "cpu"
        except Exception:
            pass
    pinned = os.environ.get("JAX_PLATFORMS", "")
    return bool(pinned) and pinned.lower() != "cpu"


def _backend_already_up() -> Optional[str]:
    """The platform name if this process already initialized a backend
    (then it cannot raise again and probing is pointless), else None."""
    jax = sys.modules.get("jax")
    if jax is None:
        return None
    try:
        from jax._src import xla_bridge

        if getattr(xla_bridge, "_default_backend", None) is not None:
            return xla_bridge._default_backend.platform
    except Exception:
        pass
    return None


def _warn_once(message: str) -> None:
    global _WARNED
    if not _WARNED:
        _WARNED = True
        print(f"WARNING: {message}", file=sys.stderr)


def _force_cpu(reason: str) -> None:
    """Flip this process (and its children) to the CPU platform."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    _warn_once(
        "accelerator backend unavailable "
        f"({reason}); continuing on the CPU backend"
    )


def _run_probe() -> None:
    """Subprocess body: init the pinned backend in a killable child."""
    global _PROBE_OK, _PROBE_DETAIL
    global _PROBE_ELAPSED
    import time as _time

    start = _time.monotonic()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True,
            timeout=_probe_timeout_s(),
            text=True,
        )
        _PROBE_ELAPSED = _time.monotonic() - start
        _PROBE_OK = proc.returncode == 0
        if not _PROBE_OK:
            tail = (proc.stderr or "").strip().splitlines()
            _PROBE_DETAIL = tail[-1][:200] if tail else f"probe rc={proc.returncode}"
    except subprocess.TimeoutExpired:
        _PROBE_OK = False
        _PROBE_DETAIL = f"backend init probe timed out after {_probe_timeout_s():.0f}s"
    except Exception as exc:  # probe infrastructure failure: stay optimistic
        _PROBE_OK = True
        _PROBE_DETAIL = f"probe could not run ({exc})"


def start_probe() -> None:
    """Begin the guarded backend probe in the background (idempotent).

    Call early — pipeline entry — so the probe's wall time overlaps the
    fragment pass instead of stalling the first inference batch."""
    global _PROBE
    with _LOCK:
        if _PROBE is not None or _BACKEND is not None:
            return
        if os.environ.get("RPVG_TPU_FORCE_BACKEND"):
            return
        if _probe_timeout_s() <= 0:
            return
        if not _pinned_non_cpu() or _backend_already_up() is not None:
            return
        _PROBE = threading.Thread(
            target=_run_probe, name="rpvg-backend-probe", daemon=True
        )
        _PROBE.start()


def safe_default_backend() -> str:
    """``jax.default_backend()`` that cannot take the pipeline down.

    First call joins the probe (if one was started), flips to CPU on a
    failed/timed-out probe, then touches the in-process backend under
    try/except with a CPU retry.  Subsequent calls return the cached
    platform name.  Never raises; worst case returns "cpu"."""
    global _BACKEND
    if _BACKEND is not None:
        return _BACKEND
    with _LOCK:
        if _BACKEND is not None:
            return _BACKEND

        forced = os.environ.get("RPVG_TPU_FORCE_BACKEND")
        if forced:
            try:
                import jax

                jax.config.update("jax_platforms", forced)
                _BACKEND = jax.default_backend()
            except Exception as exc:
                _force_cpu(f"forced platform {forced!r} failed: {exc}")
                _BACKEND = "cpu"
            return _BACKEND

        probe = _PROBE
        if probe is not None:
            # The probe had the full budget from start_probe(); grant the
            # same again from here so a late first consult still bounds.
            probe.join(timeout=_probe_timeout_s() + 5.0)
            if probe.is_alive() or _PROBE_OK is False:
                detail = _PROBE_DETAIL or "probe still running past its timeout"
                _force_cpu(detail)
                _BACKEND = "cpu"
                return _BACKEND

        try:
            if probe is not None:
                # Probed (pinned-accelerator) regime: the tunnel can
                # wedge BETWEEN the probe's healthy verdict and this
                # in-process init, and a hang here is unrecoverable
                # in-process — watchdog it.
                _BACKEND = _touch_backend_with_watchdog()
            else:
                import jax

                _BACKEND = jax.default_backend()
        except Exception as exc:
            _force_cpu(str(exc).splitlines()[0][:200])
            try:
                import jax

                _BACKEND = jax.default_backend()
            except Exception:
                _BACKEND = "cpu"
        return _BACKEND


_DEVICE_WATCHDOG: Optional[threading.Event] = None


def _device_wall_s() -> float:
    """Budget for the device-backed inference half under a probed
    (tunnelled, pinned-platform) accelerator.  The link policy routes
    the heavy compute to host on such links, so legitimate device time
    is small; a half that exceeds this bound means the tunnel wedged
    mid-run (it can pass the health probe and die minutes later —
    observed live), and the only clean recovery is restarting on CPU."""
    try:
        return float(os.environ.get("RPVG_TPU_DEVICE_WALL_S", "900"))
    except ValueError:
        return 900.0


def arm_device_watchdog() -> None:
    """Bound the device-backed inference half: if it runs past the
    budget while a probed non-CPU backend is active and the CLI
    registered a restart argv, re-exec the run pinned to CPU.  Covers
    the case the init guards cannot: a tunnel that wedges AFTER a
    healthy init, hanging an individual dispatch forever.  No-op on
    the cpu backend, without a registered argv, or in a re-exec'd run."""
    global _DEVICE_WATCHDOG
    if (
        _BACKEND in (None, "cpu")
        or _EXEC_ARGV is None
        or _PROBE is None
        or os.environ.get("RPVG_TPU_EXEC_DEPTH") == "1"
        or _device_wall_s() <= 0
    ):
        return
    # Enforce the tunnel scoping the budget assumes: on a tunnelled
    # link (the wedge-prone regime) the routing policy keeps the heavy
    # compute on host, so legitimate device time is small and the
    # budget is safe; on direct-attached hardware (dispatch well under
    # 1 ms) long device halves are legitimate — never arm there.
    # DEVICE-FREE signals only (a probe_link() first call dispatches
    # device work in-process and would itself hang on a wedged tunnel):
    # the env override, an already-cached link measurement, or the
    # subprocess probe's own wall time (a healthy tunnelled init takes
    # ~80-90s; direct-attached backends come up in seconds).
    tunnelled = None
    env_disp = os.environ.get("RPVG_TPU_LINK_DISPATCH_S")
    if env_disp:
        try:
            tunnelled = float(env_disp) > 1e-3
        except ValueError:
            tunnelled = None
    if tunnelled is None:
        try:
            from .parallel import linkprobe

            cached = linkprobe._CACHE
            if cached:
                tunnelled = cached.get("dispatch_s", 0.0) > 1e-3
        except Exception:
            pass
    if tunnelled is None and _PROBE_ELAPSED is not None:
        tunnelled = _PROBE_ELAPSED > 30.0
    if not tunnelled:
        return
    disarm_device_watchdog()
    done = threading.Event()
    argv = list(_EXEC_ARGV)
    budget = _device_wall_s()

    def _watch():
        if done.wait(timeout=budget):
            return
        # Completion race: the half may be finishing right now —
        # re-check after a grace period before declaring it wedged.
        import time as _time

        _time.sleep(2.0)
        if done.is_set():
            return
        print(
            f"WARNING: device-backed inference exceeded {budget:.0f}s "
            "through the tunnelled accelerator (wedged mid-run); "
            "restarting this run on the CPU backend",
            file=sys.stderr,
        )
        sys.stdout.flush()
        sys.stderr.flush()
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["RPVG_TPU_FORCE_BACKEND"] = "cpu"
        os.environ["RPVG_TPU_EXEC_DEPTH"] = "1"
        os.execv(argv[0], argv)

    _DEVICE_WATCHDOG = done
    threading.Thread(target=_watch, name="rpvg-device-watchdog", daemon=True).start()


def disarm_device_watchdog() -> None:
    global _DEVICE_WATCHDOG
    if _DEVICE_WATCHDOG is not None:
        _DEVICE_WATCHDOG.set()
        _DEVICE_WATCHDOG = None


def reset_for_tests() -> None:
    """Clear the cached verdicts (tests only)."""
    global _BACKEND, _PROBE, _PROBE_OK, _PROBE_DETAIL, _WARNED, _EXEC_ARGV
    with _LOCK:
        _BACKEND = None
        _PROBE = None
        _PROBE_OK = None
        _PROBE_DETAIL = ""
        _WARNED = False
        _EXEC_ARGV = None
