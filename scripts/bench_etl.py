#!/usr/bin/env python
"""ETL (WOMD -> packed h5) throughput benchmark.

BASELINE context: the reference packs the 486,995-scenario training split in
~2 days on a 12-core node (/root/reference/README.md:51, bash/pack_h5.sh) —
~2.8 scenarios/s aggregate. This benchmark times the pure packing pipeline
(collated features -> filtered/repacked episode) at FULL WOMD tensor sizes on
identical synthetic scenarios, for our packer and — when a reference checkout
is available — the reference's pack_h5, single-core, same call sequence as
the packer CLIs (tests/etl_parity_common.run_pipeline).

    python scripts/bench_etl.py [n_scenarios] [/path/to/reference]

Prints one JSON line per packer with scenarios/s and the extrapolated
training-split wall-clock at the CLI's default 12-worker pool.
"""

from __future__ import annotations

import json
import math
import sys
import time
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import etl_parity_common as C  # noqa: E402

# full WOMD sizes (scripts/pack_h5_womd.py constants; reference :43-49)
FULL = dict(N_MP_DATA=10_000, N_TL_DATA=128, N_AG_DATA=256,
            N_MP_H5=1024, N_TL_LANE_H5=128, N_AG_H5_SIM=64, N_AG_H5_NO_SIM=256)
TRAIN_SPLIT = 486_995
POOL = 12  # bash/pack_h5.sh core count


def _bench(mod, raws, is_ref: bool) -> dict:
    t0 = time.perf_counter()
    for i, raw in enumerate(raws):
        C.run_pipeline(mod, raw, dataset="training", is_ref=is_ref, seed=i)
    dt = time.perf_counter() - t0
    per_core = len(raws) / dt
    return {
        "scenarios_per_sec_per_core": round(per_core, 3),
        "train_split_hours_at_12_cores": round(TRAIN_SPLIT / (per_core * POOL) / 3600, 2),
    }


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    for k, v in FULL.items():
        setattr(C, k, v)
    # realistic raw scale: ~250 polylines, 91 steps, 80 tracked agents
    raws = [C.make_raw(seed=i, n_pl=250, n_ag=80, n_step=91) for i in range(n)]

    from trafficbotsv15_tpu.data import pack_episode as ours

    _bench(ours, raws[:2], is_ref=False)  # warmup
    res = _bench(ours, raws, is_ref=False)
    print(json.dumps({"packer": "trafficbotsv15_tpu", **res}))

    ref_root = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("/root/reference")
    if (ref_root / "src/utils/pack_h5.py").exists():
        _stub_transforms3d()
        sys.path.insert(0, str(ref_root / "src"))
        import utils.pack_h5 as ref_pack  # noqa: E402

        _bench(ref_pack, raws[:2], is_ref=True)  # warmup
        res_ref = _bench(ref_pack, raws, is_ref=True)
        print(json.dumps({"packer": "reference", **res_ref,
                          "speedup": round(res["scenarios_per_sec_per_core"]
                                           / res_ref["scenarios_per_sec_per_core"], 2)}))
    return 0


def _stub_transforms3d():
    """transforms3d shim (pure z-rotations only), as in gen_etl_golden.py."""
    t3d = types.ModuleType("transforms3d")
    euler = types.ModuleType("transforms3d.euler")

    def euler2mat(ax, ay, az):
        c, s = math.cos(az), math.sin(az)
        return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])

    def mat2euler(rot):
        return (0.0, 0.0, math.atan2(rot[1][0], rot[0][0]))

    euler.euler2mat = euler2mat
    euler.mat2euler = mat2euler
    t3d.euler = euler
    sys.modules["transforms3d"] = t3d
    sys.modules["transforms3d.euler"] = euler


if __name__ == "__main__":
    raise SystemExit(main())
