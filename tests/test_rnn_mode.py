"""TrafficBots RNN mode (temp_window_size <= 0): the second architecture family
(agent_encoder.py:180-319): GRU carry through the rollout scan, flattened
sequence latent encoder."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trafficbotsv15_tpu.config import tiny_config
from trafficbotsv15_tpu.data.synthetic import make_batch
from trafficbotsv15_tpu.train.pipeline import build_model, init_params, training_forward


@pytest.fixture(scope="module")
def setup():
    cfg0 = tiny_config(n_ag=6, n_mp=24, n_tl=6, n_step=13, hidden_dim=32)
    cfg = dataclasses.replace(cfg0, model=dataclasses.replace(cfg0.model, temp_window_size=0))
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg.data, n_sc=2, seed=5).items()}
    model = build_model(cfg)
    params = init_params(cfg, model, batch, jax.random.PRNGKey(0))
    return cfg, batch, model, params


@pytest.mark.slow
def test_rnn_training_forward(setup):
    cfg, batch, model, params = setup
    loss, metrics = training_forward(cfg, model, params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)), metrics
    g = jax.grad(lambda p: training_forward(cfg, model, p, batch, jax.random.PRNGKey(1))[0])(params)
    gn = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
