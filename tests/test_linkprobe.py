"""Measured link policy (parallel/linkprobe.py): the greedy slot
router must respect env overrides and the transfer-inside-host-window
budget; on CPU-only backends it routes nothing."""

import numpy as np

from rpvg_tpu.parallel import linkprobe


def test_env_cutoff_override(monkeypatch):
    monkeypatch.setenv("RPVG_TPU_DEVICE_SLOT_AREA", "100")
    assert linkprobe.select_device_slots([10, 100, 5000, 99]) == [1, 2]
    monkeypatch.setenv("RPVG_TPU_DEVICE_SLOT_AREA", "0")
    assert linkprobe.select_device_slots([10, 100, 5000]) == []


def test_cpu_backend_routes_nothing(monkeypatch):
    monkeypatch.delenv("RPVG_TPU_DEVICE_SLOT_AREA", raising=False)
    # Tests run on the CPU backend: probe_link returns None -> no routing.
    linkprobe._CACHE = None
    try:
        assert linkprobe.select_device_slots([10**6] * 10) == []
    finally:
        linkprobe._CACHE = None


def test_greedy_budget_with_fake_link(monkeypatch):
    # Fast link, slow host: everything routes.  Slow link: nothing does.
    monkeypatch.delenv("RPVG_TPU_DEVICE_SLOT_AREA", raising=False)
    areas = [500_000, 400_000, 100_000, 50_000, 10]
    fast = {"dispatch_s": 1e-4, "h2d_bps": 16e9, "host_em_ns_per_area": 150.0}
    slow = {"dispatch_s": 0.025, "h2d_bps": 1e6, "host_em_ns_per_area": 150.0}
    try:
        linkprobe._CACHE = fast
        routed = linkprobe.select_device_slots(areas)
        # The largest slots route; the budget stops before the host
        # window empties (never routes literally everything).
        assert routed and routed[0] == 0
        assert set(routed) <= set(range(len(areas)))
        linkprobe._CACHE = slow
        assert linkprobe.select_device_slots(areas) == []
    finally:
        linkprobe._CACHE = None


def test_greedy_prefers_largest(monkeypatch):
    monkeypatch.delenv("RPVG_TPU_DEVICE_SLOT_AREA", raising=False)
    try:
        linkprobe._CACHE = {
            "dispatch_s": 1e-4, "h2d_bps": 1e9, "host_em_ns_per_area": 150.0,
        }
        areas = np.array([10, 10, 800_000, 10, 600_000] + [1000] * 50)
        routed = linkprobe.select_device_slots(areas)
        assert 2 in routed and 4 in routed
        assert 0 not in routed
    finally:
        linkprobe._CACHE = None
