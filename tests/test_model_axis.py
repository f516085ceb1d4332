"""The MODEL mesh axis actually shards hidden dims (VERDICT r1 #10).

scaled_config()'s model dims (hidden 256, 12/6/6-layer encoders) are run on
tiny data with tensor-parallel parameter sharding over a (data=2, model=4)
virtual mesh: one full training step must compile and execute with the
attention/FFN projections sharded on the model axis — proving the declared
extension axis is functional, not decorative."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from trafficbotsv15_tpu.config import scaled_config, tiny_config
from trafficbotsv15_tpu.data.synthetic import make_batch
from trafficbotsv15_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh, tp_shard_params
from trafficbotsv15_tpu.train.optimizer import make_optimizer
from trafficbotsv15_tpu.train.pipeline import build_model, init_params, make_train_step


def _scaled_dims_tiny_data():
    """scaled_config()'s MODEL (hidden 256, deep encoders) on tiny data/horizon
    so the one-CPU compile stays tractable."""
    tiny = tiny_config()
    scaled = scaled_config()
    return dataclasses.replace(tiny, model=dataclasses.replace(
        scaled.model,
        n_tgt_knn=tiny.model.n_tgt_knn,
        temp_window_size=tiny.model.temp_window_size,
    ))


@pytest.mark.slow
def test_scaled_dims_train_step_model_axis_sharded():
    cfg = _scaled_dims_tiny_data()
    assert cfg.model.hidden_dim == 256 and cfg.model.tf_cfg.d_model == 256

    mesh = make_mesh(n_data=2, n_model=4)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg.data, n_sc=2, seed=0).items()}
    model = build_model(cfg)
    params = init_params(cfg, model, batch, jax.random.PRNGKey(0))

    tp_params = tp_shard_params(params, mesh)
    # the sharding is real: some kernels must be split over the model axis
    specs = [x.sharding.spec for x in jax.tree_util.tree_leaves(tp_params)]
    n_model_sharded = sum(MODEL_AXIS in [a for a in s if a] for s in specs)
    assert n_model_sharded > 20, f"only {n_model_sharded} params sharded on model axis"

    opt = make_optimizer(cfg.optimizer, steps_per_epoch=10)
    opt_state = opt.init(tp_params)
    tp_batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS))), batch)
    step = jax.jit(make_train_step(cfg, model, opt))
    new_params, _, metrics = step(tp_params, opt_state, tp_batch, jax.random.PRNGKey(1), 0)
    jax.block_until_ready(new_params)
    loss = float(metrics["training/loss"])
    assert np.isfinite(loss)

    # gradients kept the model-axis sharding (update didn't silently replicate)
    out_specs = [x.sharding.spec for x in jax.tree_util.tree_leaves(new_params)]
    n_out = sum(MODEL_AXIS in [a for a in s if a] for s in out_specs)
    assert n_out >= n_model_sharded // 2
