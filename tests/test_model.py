"""End-to-end model tests: init the TrafficBots policy on a tiny config and run
map encoding, tl precompute, latent encoding, navi prediction and one sim step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trafficbotsv15_tpu.config import tiny_config
from trafficbotsv15_tpu.data.preprocessing import pre_processing
from trafficbotsv15_tpu.data.synthetic import make_batch
from trafficbotsv15_tpu.models.traffic_bots import TrafficBots


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    batch_np = make_batch(cfg.data, n_sc=2, seed=0)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    pp = pre_processing(
        batch, tl_mode=cfg.model.tl_mode, navi_mode=cfg.model.navi_mode,
        n_step_hist=cfg.n_step_hist, dropout_p_history=-1.0, training=True,
    )
    model = TrafficBots(cfg=cfg.model, time_step_gt=cfg.time_step_gt, navi_dim=None)

    key = jax.random.PRNGKey(0)
    W = cfg.model.temp_window_size
    n_sc, n_ag = pp.ag_valid.shape[:2]
    n_tl = pp.tl_valid.shape[1]

    step_args = dict(
        ag_valid=pp.ag_valid[:, :, -1],
        hist_ag_valid=pp.ag_valid[:, :, -W:],
        hist_ag_pose=pp.ag_pose[:, :, -W:],
        hist_ag_motion=pp.ag_motion[:, :, -W:],
        hist_tl_state=pp.tl_state[:, :, -W:].astype(jnp.float32),
        hist_step_invalid=jnp.zeros(W, bool),
        ag_attr=pp.ag_attr,
        ag_type=pp.ag_type,
        ag_latent=jnp.zeros((n_sc, n_ag, cfg.model.latent_encoder.latent_dim)),
        ag_latent_valid=jnp.any(pp.ag_valid, -1),
        ag_navi=pp.gt_navi,
        ag_navi_valid=jnp.any(pp.gt_valid, -1),
    )

    def init_fn(m):
        mp_tokens = m.encode_map(pp.mp_valid, pp.mp_attr, pp.mp_pose, pp.mp_type)
        tl_tokens = m.precompute_tl(pp.tl_valid, pp.tl_attr, pp.tl_pose, mp_tokens)
        post = m.encode_latent(pp.gt_valid, pp.ag_attr, pp.gt_motion, pp.gt_pose, pp.ag_type,
                               pp.gt_tl_state.astype(jnp.float32), mp_tokens, tl_tokens, posterior=True)
        prior = m.encode_latent(pp.ag_valid, pp.ag_attr, pp.ag_motion, pp.ag_pose, pp.ag_type,
                                pp.tl_state.astype(jnp.float32), mp_tokens, tl_tokens, posterior=False)
        navi = m.predict_navi(pp.ag_valid, pp.ag_attr, pp.ag_motion, pp.ag_pose, pp.ag_type, mp_tokens)
        out = m.step(tl_tokens=tl_tokens, mp_tokens=mp_tokens, **step_args)
        return mp_tokens, tl_tokens, post, prior, navi, out

    params = model.init({"params": key, "dropout": key}, method=init_fn)["params"]
    return cfg, pp, model, params, step_args


def test_param_count_and_shapes(setup):
    cfg, pp, model, params, step_args = setup
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert n > 10_000  # tiny config still has real capacity


def test_map_encoder(setup):
    cfg, pp, model, params, step_args = setup
    mp_tokens = model.apply({"params": params}, pp.mp_valid, pp.mp_attr, pp.mp_pose, pp.mp_type,
                            method="encode_map")
    n_sc, n_mp = pp.mp_valid.shape[:2]
    assert mp_tokens.feature.shape == (n_sc, n_mp, cfg.model.hidden_dim)
    f = np.asarray(mp_tokens.feature)
    assert np.isfinite(f).all()
    # invalid polylines have zero features
    inv = np.asarray(mp_tokens.invalid)
    assert np.abs(f[inv]).max() == 0.0
    assert np.abs(f[~inv]).sum() > 0


def test_full_pipeline_step(setup):
    cfg, pp, model, params, step_args = setup
    mp_tokens = model.apply({"params": params}, pp.mp_valid, pp.mp_attr, pp.mp_pose, pp.mp_type,
                            method="encode_map")
    tl_tokens = model.apply({"params": params}, pp.tl_valid, pp.tl_attr, pp.tl_pose, mp_tokens,
                            method="precompute_tl")
    post = model.apply({"params": params}, pp.gt_valid, pp.ag_attr, pp.gt_motion, pp.gt_pose, pp.ag_type,
                       pp.gt_tl_state.astype(jnp.float32), mp_tokens, tl_tokens, True, method="encode_latent")
    prior = model.apply({"params": params}, pp.ag_valid, pp.ag_attr, pp.ag_motion, pp.ag_pose, pp.ag_type,
                        pp.tl_state.astype(jnp.float32), mp_tokens, tl_tokens, False, method="encode_latent")
    assert post.mean.shape == (2, cfg.data.n_ag, cfg.model.latent_encoder.latent_dim)
    assert np.isfinite(np.asarray(post.mean)).all()
    # prior is std_gaus by default: zero mean unit std
    np.testing.assert_allclose(np.asarray(prior.mean), 0.0)
    np.testing.assert_allclose(np.asarray(prior.std), 1.0)

    navi = model.apply({"params": params}, pp.ag_valid, pp.ag_attr, pp.ag_motion, pp.ag_pose, pp.ag_type,
                       mp_tokens, method="predict_navi")
    n_mp = pp.mp_valid.shape[1]
    assert navi.logits.shape == (2, cfg.data.n_ag, n_mp)
    assert np.isfinite(np.asarray(navi.probs)).all()

    action_dist, tl_logits, _, _ = model.apply(
        {"params": params}, tl_tokens=tl_tokens, mp_tokens=mp_tokens, method="step", **step_args
    )
    assert action_dist.mean.shape == (2, cfg.data.n_ag, 2)
    assert np.isfinite(np.asarray(action_dist.mean)).all()
    assert tl_logits.shape == (2, cfg.data.n_tl_lane, 5)
    assert np.abs(np.asarray(tl_logits)).max() <= 3.0

    # sampled action differs from mean; deterministic equals mean
    key = jax.random.PRNGKey(1)
    a_det = action_dist.sample(key, True)
    a_rnd = action_dist.sample(key, False)
    np.testing.assert_allclose(np.asarray(a_det), np.asarray(action_dist.mean))
    valid = np.asarray(step_args["ag_valid"])
    assert np.abs(np.asarray(a_rnd) - np.asarray(action_dist.mean))[valid].sum() > 0


@pytest.mark.slow
def test_gradients_flow(setup):
    cfg, pp, model, params, step_args = setup

    def loss_fn(p):
        mp_tokens = model.apply({"params": p}, pp.mp_valid, pp.mp_attr, pp.mp_pose, pp.mp_type,
                                method="encode_map")
        tl_tokens = model.apply({"params": p}, pp.tl_valid, pp.tl_attr, pp.tl_pose, mp_tokens,
                                method="precompute_tl")
        action_dist, tl_logits, _, _ = model.apply(
            {"params": p}, tl_tokens=tl_tokens, mp_tokens=mp_tokens, method="step", **step_args
        )
        return jnp.sum(action_dist.mean**2) + jnp.sum(tl_logits**2)

    g = jax.grad(loss_fn)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_tl_static_kv_equivalence(setup):
    """Per-step TL forward with hoisted static K/V == full recompute path."""
    import dataclasses

    cfg, pp, model, params, step_args = setup

    def run(m, strip_cache):
        mp_tokens = m.encode_map(pp.mp_valid, pp.mp_attr, pp.mp_pose, pp.mp_type)
        tl_tokens = m.precompute_tl(pp.tl_valid, pp.tl_attr, pp.tl_pose, mp_tokens)
        if strip_cache:
            tl_tokens = dataclasses.replace(tl_tokens, static_kv=None)
        return m.step(tl_tokens=tl_tokens, mp_tokens=mp_tokens, **step_args)

    fast = model.apply({"params": params}, False, method=run)
    slow = model.apply({"params": params}, True, method=run)
    a, b = fast[1], slow[1]  # tl logits
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
