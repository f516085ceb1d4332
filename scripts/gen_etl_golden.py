#!/usr/bin/env python
"""Generate ETL bit-parity goldens by running the REFERENCE packer offline.

Runs /root/reference/src/utils/pack_h5.py (numpy+scipy; transforms3d is
stubbed with the exact z-rotation formulas it uses) over the synthetic
scenarios from tests/etl_parity_common.py and writes
tests/golden/etl_parity_golden.npz. Run once when regenerating goldens:

    python scripts/gen_etl_golden.py [/path/to/reference]

tests/test_etl_parity.py then diffs our trafficbotsv15_tpu.data.pack_episode
against the committed npz without needing the reference checkout.
"""

from __future__ import annotations

import math
import sys
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def _stub_transforms3d():
    """Minimal transforms3d shim: pack_h5's transform_utils only uses pure
    z-rotations (euler2mat(0,0,yaw) and mat2euler(R)[2])."""
    t3d = types.ModuleType("transforms3d")
    euler = types.ModuleType("transforms3d.euler")

    def euler2mat(ax, ay, az):
        assert ax == 0 and ay == 0, (ax, ay)
        c, s = math.cos(az), math.sin(az)
        return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])

    def mat2euler(rot):
        return (0.0, 0.0, math.atan2(rot[1][0], rot[0][0]))

    euler.euler2mat = euler2mat
    euler.mat2euler = mat2euler
    t3d.euler = euler
    sys.modules["transforms3d"] = t3d
    sys.modules["transforms3d.euler"] = euler


def main() -> int:
    ref_root = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/root/reference")
    if not (ref_root / "src/utils/pack_h5.py").exists():
        print(f"reference packer not found under {ref_root}")
        return 1
    _stub_transforms3d()
    sys.path.insert(0, str(ref_root / "src"))
    import utils.pack_h5 as ref_pack  # noqa: E402

    from etl_parity_common import make_raw, run_pipeline  # noqa: E402

    out = {}
    for seed in range(50):
        for dataset in ("training", "validation", "testing"):
            raw = make_raw(seed)
            reduced = run_pipeline(ref_pack, raw, dataset, is_ref=True, seed=seed)
            for k, v in reduced.items():
                out[f"{seed}|{dataset}|{k}"] = np.asarray(v)
    # function-level goldens: polygon -> polylines helper (pack_h5.py:822-849),
    # used by the CLI collate for speed bumps / driveways / crosswalks
    rng = np.random.default_rng(7)
    for p in range(4):
        quad = np.cumsum(rng.uniform(1.0, 8.0, (4, 3)), axis=0)
        quad[:, 2] = 0.0
        pls = ref_pack.get_polylines_from_polygon(quad)
        out[f"polygon|{p}|in"] = quad
        for j, pl in enumerate(pls):
            out[f"polygon|{p}|out{j}"] = np.asarray(pl)

    dest = REPO / "tests/golden/etl_parity_golden.npz"
    dest.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(dest, **out)
    print(f"wrote {dest} ({len(out)} arrays)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
