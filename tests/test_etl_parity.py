"""ETL bit-parity: our packer vs goldens from the reference's pack_h5.py.

Goldens in tests/golden/etl_parity_golden.npz were produced by running the
REFERENCE implementation (/root/reference/src/utils/pack_h5.py) through the
same driver — see scripts/gen_etl_golden.py. Integer/bool arrays must match
bit for bit; floats to 1e-6 (scipy interp1d vs np.interp and float32
accumulation order differ at the ulp level only).
"""

from pathlib import Path

import numpy as np
import pytest

from trafficbotsv15_tpu.data import pack_episode as pk
from tests.etl_parity_common import make_raw, run_pipeline

GOLDEN = Path(__file__).parent / "golden/etl_parity_golden.npz"


@pytest.mark.parametrize("seed", range(50))
@pytest.mark.parametrize("dataset", ["training", "validation", "testing"])
def test_pack_parity(seed, dataset):
    golden = np.load(GOLDEN)
    ours = run_pipeline(pk, make_raw(seed), dataset, is_ref=False, seed=seed)

    keys = {k.split("|", 2)[2] for k in golden.files if k.startswith(f"{seed}|{dataset}|")}
    assert keys, "no goldens for this case — regenerate via scripts/gen_etl_golden.py"
    missing = keys - set(ours)
    assert not missing, f"our packer lacks keys: {sorted(missing)}"

    for key in sorted(keys):
        exp = golden[f"{seed}|{dataset}|{key}"]
        got = np.asarray(ours[key])
        assert got.shape == exp.shape, (key, got.shape, exp.shape)
        if exp.dtype.kind in "biu":
            np.testing.assert_array_equal(got, exp, err_msg=key)
        else:
            # scipy interp1d and np.interp agree to the ulp in f64; the f32
            # derivative keys (acc/yaw_rate) amplify that to ~2e-5
            np.testing.assert_allclose(got, exp, atol=5e-5, rtol=1e-5, err_msg=key)


def test_polygon_to_polylines_parity():
    """get_polylines_from_polygon vs the reference (pack_h5.py:822-849)."""
    golden = np.load(GOLDEN)
    for p in range(4):
        quad = golden[f"polygon|{p}|in"]
        pls = pk.get_polylines_from_polygon(quad)
        for j, pl in enumerate(pls):
            np.testing.assert_allclose(
                np.asarray(pl), golden[f"polygon|{p}|out{j}"], atol=1e-6,
                err_msg=f"polygon {p} part {j}")
