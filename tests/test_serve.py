"""Interactive serving API: reset/step/scripted-agent override."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trafficbotsv15_tpu.config import tiny_config
from trafficbotsv15_tpu.data.synthetic import make_batch
from trafficbotsv15_tpu.serve import InteractiveSimulator
from trafficbotsv15_tpu.train.pipeline import build_model, init_params


@pytest.mark.slow
def test_interactive_simulator():
    cfg = tiny_config(n_ag=6, n_mp=20, n_tl=6, n_step=13, hidden_dim=32)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg.data, n_sc=1, seed=9).items()}
    params = init_params(cfg, build_model(cfg), batch, jax.random.PRNGKey(0))

    sim = InteractiveSimulator(cfg, params)
    obs = sim.reset(batch, jax.random.PRNGKey(1))
    assert obs["pose"].shape[0] == 1
    p0 = obs["pose"].copy()

    for _ in range(3):
        out = sim.step()
    assert np.isfinite(out["pose"]).all()
    valid = out["valid"]
    moved = np.abs(out["pose"][valid] - p0[valid])
    assert np.isfinite(moved).all()

    # scripted agent: force agent 0 to full acceleration, straight
    n_ag = p0.shape[1]
    act = {"valid": np.zeros((1, n_ag), bool), "action": np.zeros((1, n_ag, 2), np.float32)}
    act["valid"][0, 0] = True
    act["action"][0, 0] = [5.0, 0.0]  # acc m/s^2 (already bounded space)
    spd_before = out["motion"][0, 0, 0]
    out2 = sim.step(actions=act)
    spd_after = out2["motion"][0, 0, 0]
    if out["valid"][0, 0]:
        assert spd_after > spd_before  # forced acceleration takes effect

    hist = sim.history()
    assert hist["pose"].shape[2] == 4

    # async mode: observation stays on device (no host sync per step);
    # history() materializes everything at the end
    out3 = sim.step(fetch=False)
    assert isinstance(out3["pose"], jnp.ndarray)
    hist = sim.history()
    assert hist["pose"].shape[2] == 5
    assert np.isfinite(hist["pose"]).all()
