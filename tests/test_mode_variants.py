"""Coverage of alternative architecture modes: navi goal/cmd/dummy, tl stop,
scene-centric (pairwise_relative=False), latent disabled."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trafficbotsv15_tpu.config import LatentEncoderCfg, tiny_config
from trafficbotsv15_tpu.data.synthetic import make_batch
from trafficbotsv15_tpu.train.pipeline import build_model, init_params, training_forward


def _run(cfg, seed=11):
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg.data, n_sc=2, seed=seed).items()}
    model = build_model(cfg)
    params = init_params(cfg, model, batch, jax.random.PRNGKey(0))
    loss, metrics = training_forward(cfg, model, params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)), metrics
    return float(loss), metrics


def _small():
    return tiny_config(n_ag=6, n_mp=20, n_tl=6, n_step=13, hidden_dim=32)


@pytest.mark.slow
def test_navi_goal():
    cfg = _small()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, navi_mode="goal"))
    loss, m = _run(cfg)
    assert "training/navi_loss" in m


@pytest.mark.slow
def test_navi_cmd():
    cfg = _small()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, navi_mode="cmd"))
    loss, m = _run(cfg)
    assert "training/navi_loss" in m


@pytest.mark.slow
def test_navi_dummy_and_no_latent():
    cfg = _small()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, navi_mode="dummy", latent_encoder=LatentEncoderCfg(latent_dim=0)))
    loss, m = _run(cfg)
    assert "training/navi_loss" not in m
    assert "training/vae_kl" not in m


@pytest.mark.slow
def test_tl_stop_mode():
    cfg = _small()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, tl_mode="stop"))
    loss, m = _run(cfg)
    assert "training/tl_state_loss" in m


@pytest.mark.slow
def test_scene_centric_not_pairwise():
    cfg = _small()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, pairwise_relative=False))
    loss, m = _run(cfg)
    assert np.isfinite(loss)
