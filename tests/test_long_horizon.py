"""Long-horizon rollout: step_end beyond the GT episode (scaled_config's >8 s
free-running regime) — beyond-GT steps have no forcing, no loss, no tl GT."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trafficbotsv15_tpu.config import tiny_config
from trafficbotsv15_tpu.data.synthetic import make_batch
from trafficbotsv15_tpu.train.pipeline import build_model, init_params
from trafficbotsv15_tpu.train.evaluation import joint_future_pred


@pytest.mark.slow
def test_rollout_beyond_gt():
    cfg0 = tiny_config(n_ag=6, n_mp=20, n_tl=6, n_step=13, hidden_dim=32)
    cfg = dataclasses.replace(cfg0, time_step_end=20)  # gt ends at 12
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg.data, n_sc=1, seed=3).items()}
    model = build_model(cfg)
    params = init_params(cfg, model, batch, jax.random.PRNGKey(0))
    pp, buf = joint_future_pred(cfg, model, params, batch, jax.random.PRNGKey(1), n_joint_future=2)
    assert buf.pred_pose.shape[3] == 20
    assert np.isfinite(np.asarray(buf.pred_pose)).all()
    # beyond-GT steps: tl NLL marked invalid, no teacher forcing
    nll_inv = np.asarray(buf.tl_state_nll_invalid)  # [n_sc, K, n_tl, n_step]
    assert nll_inv[..., 13:].all()
    assert not np.asarray(buf.mask_teacher_forcing)[..., 13:].any()
