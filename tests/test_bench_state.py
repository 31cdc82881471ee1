"""Guards on the bench-state persistence and fusion-gate defaults.

The driver's end-of-round capture depends on bench.py emitting a
last-healthy accelerator window (marked stale) when the device tunnel
is wedged at capture time; these tests pin the state-file helpers and
the round-5 fusion default without touching a device.
"""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def test_bench_state_round_trip(tmp_path, monkeypatch):
    bench = _load_bench()
    state_path = str(tmp_path / "state.json")
    monkeypatch.setattr(bench, "STATE_PATH", state_path)

    assert bench._load_state() == {}
    key = bench._workload_key(100000, 9000, False)
    bench._save_state({"tpu": {key: {"pairs_per_s": 84192.97, "recorded_unix": 1}}})
    loaded = bench._load_state()
    assert loaded["tpu"][key]["pairs_per_s"] == 84192.97
    # Atomic write: no .tmp residue.
    assert not os.path.exists(state_path + ".tmp")


def test_bench_state_survives_corruption(tmp_path, monkeypatch):
    bench = _load_bench()
    state_path = str(tmp_path / "state.json")
    monkeypatch.setattr(bench, "STATE_PATH", state_path)
    with open(state_path, "w") as handle:
        handle.write("{not json")
    assert bench._load_state() == {}


def test_workload_key_distinguishes_regimes():
    bench = _load_bench()
    keys = {
        bench._workload_key(100000, 9000, False),
        bench._workload_key(100000, 9000, True),
        bench._workload_key(500000, 9000, False),
    }
    assert len(keys) == 3


def test_fused_em_defaults_off(monkeypatch):
    """Round-5 policy (FUSE_AB_r05.json): the fused launch loses end to
    end on every measured configuration, so it must be an explicit
    opt-in — no link-probe auto mode."""
    sys.path.insert(0, REPO)
    from rpvg_tpu.infer.batching import fuse_em_enabled

    monkeypatch.delenv("RPVG_TPU_FUSE_EM", raising=False)
    assert fuse_em_enabled() is False
    monkeypatch.setenv("RPVG_TPU_FUSE_EM", "auto")
    assert fuse_em_enabled() is False  # the old auto mode must not resurrect
    monkeypatch.setenv("RPVG_TPU_FUSE_EM", "1")
    assert fuse_em_enabled() is True
    monkeypatch.setenv("RPVG_TPU_FUSE_EM", "0")
    assert fuse_em_enabled() is False
