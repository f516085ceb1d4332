"""Unit tests for bench.py helpers (peak-flops lookup, MFU fields)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench


def test_peak_flops_matches_real_v5e_kind(monkeypatch):
    """A real v5e reports device_kind 'TPU v5 lite' — it must resolve to the
    197T v5e peak, not fall through to the generic v5 (= v5p 459T) entry."""

    class _Dev:
        def __init__(self, kind):
            self.device_kind = kind

    cases = {
        "TPU v5 lite": 197e12,
        "TPU v5e": 197e12,
        "TPU v5p": 459e12,
        "TPU v4": 275e12,
        "TPU v6e": 918e12,
        "weird accelerator": 0.0,
    }
    for kind, want in cases.items():
        monkeypatch.setattr(bench.jax, "devices", lambda k=kind: [_Dev(k)])
        assert bench._peak_flops() == want, kind


def test_mfu_fields_per_chip(monkeypatch):
    """MFU divides whole-call flops by n_chips so multi-chip runs report
    per-chip utilization like the throughput fields do."""

    class _Dev:
        device_kind = "TPU v5 lite"

    monkeypatch.setattr(bench.jax, "devices", lambda: [_Dev()] * 4)
    out = bench._mfu_fields(flops=4 * 197e12, dt=1.0)
    assert out["mfu_pct"] == 100.0
    assert out["tflops_per_sec"] == 197.0
