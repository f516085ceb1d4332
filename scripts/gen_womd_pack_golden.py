#!/usr/bin/env python
"""Byte-pin the WOMD metrics-op input packing (VERDICT r4 item 9).

`eval/womd_metrics.py::pack_waymo_inputs` builds the exact arrays fed to
Waymo's official C++ `py_metrics_ops.motion_metrics`
(/root/reference/src/models/metrics/womd.py:140-149). The official package is
absent from this image, so the packing can never be executed against the real
op here — this golden freezes its BYTES instead, the same residual-risk
whittling the byte-pinned submission protos use: any cross-round drift in the
packing (slot order, dtype, padding, type encoding) fails the golden test
before a real Waymo environment would ever see it.

Run once to (re)generate tests/golden/womd_pack_golden.npz; the paired test is
tests/test_submission_protos.py::test_pack_waymo_inputs_byte_golden. Only
regenerate on a DELIBERATE packing change, and say why in the commit.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from trafficbotsv15_tpu.config import tiny_config  # noqa: E402
from trafficbotsv15_tpu.data.synthetic import make_batch  # noqa: E402

OUT = REPO / "tests" / "golden" / "womd_pack_golden.npz"


def build_inputs():
    """Deterministic packing inputs: a synthetic batch + seeded trajectories.

    Fixed arrays, NOT model outputs — the golden pins the PACKING, so it must
    not churn when model weights or architecture evolve."""
    cfg = tiny_config()
    batch = make_batch(cfg.data, n_sc=2, seed=7)
    rng = np.random.default_rng(20260820)
    n_sc, n_ag = batch["agent/valid"].shape[:2]
    k, n_2hz = 3, 2  # tiny horizon: steps current+5, current+10
    step_current, step_gt = cfg.time_step_current, cfg.time_step_gt
    trajs = rng.normal(size=(n_sc, n_ag, k, n_2hz, 3)).astype(np.float32)
    scores = rng.uniform(size=(n_sc, n_ag, k)).astype(np.float32)
    # make the role/valid patterns non-trivial so every packing branch runs
    batch["agent/role"][..., 2] = False
    batch["agent/role"][0, :3, 2] = True
    batch["agent/role"][1, 2:5, 2] = True
    batch["agent/valid"][0, 4, :2] = False  # not fully observed -> excluded from others
    return batch, trajs, scores, step_gt, step_current


def main():
    from trafficbotsv15_tpu.eval.womd_metrics import pack_waymo_inputs

    batch, trajs, scores, step_gt, step_current = build_inputs()
    packed = pack_waymo_inputs(batch, trajs, scores, step_gt, step_current)
    np.savez_compressed(OUT, **packed)
    for k, v in packed.items():
        print(f"  {k}: {v.shape} {v.dtype} md5-ish={hash(v.tobytes()) & 0xFFFFFFFF:08x}")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
