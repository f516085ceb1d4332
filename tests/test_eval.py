"""Tests for evaluation pipelines: reactive replay, joint-future prediction
(the WOSAC x K replica workload), post-processing and logging metrics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trafficbotsv15_tpu.config import tiny_config
from trafficbotsv15_tpu.data.synthetic import make_batch
from trafficbotsv15_tpu.train.pipeline import build_model, init_params
from trafficbotsv15_tpu.train.evaluation import reactive_replay, joint_future_pred
from trafficbotsv15_tpu.eval.metrics import (
    error_metric_sums, compute_error_metrics, traffic_rule_sums, compute_traffic_rule_metrics,
)
from trafficbotsv15_tpu.eval.womd_post_processing import womd_post_process, traj_topk, mpa_nms
from trafficbotsv15_tpu.eval.wosac_post_processing import filter_futures, to_global_frame


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg.data, n_sc=2, seed=3).items()}
    model = build_model(cfg)
    params = init_params(cfg, model, batch, jax.random.PRNGKey(0))
    return cfg, batch, model, params


@pytest.mark.slow
def test_reactive_replay_and_metrics(setup):
    cfg, batch, model, params = setup
    pp, buf, navi_pred, post, prior = reactive_replay(cfg, model, params, batch, jax.random.PRNGKey(1))
    fb = buf.flatten_joint_future(1)
    sums = error_metric_sums(fb, pp.gt_valid, pp.gt_pose, pp.gt_motion)
    m = compute_error_metrics(sums, "reactive_replay")
    assert np.isfinite(m["reactive_replay/err/pos_meter"])
    rsums = traffic_rule_sums(fb, pp.ag_type)
    rm = compute_traffic_rule_metrics(rsums, "reactive_replay")
    assert 0.0 <= rm["reactive_replay/traffic_rule/collided"] <= 1.0


@pytest.mark.slow
def test_per_flavor_error_reset(setup):
    """Error-threshold resets read the PER-FLAVOR teacher-forcing config
    (reference threads one config per rollout flavor, teacher_forcing.py:107-167):
    enabling thresholds on the reactive-replay flavor — while training keeps
    them off — must increase forcing in reactive replay."""
    import dataclasses

    cfg, batch, model, params = setup
    _, buf0, *_ = reactive_replay(cfg, model, params, batch, jax.random.PRNGKey(1))
    tf_rr = dataclasses.replace(cfg.teacher_forcing_reactive_replay, threshold_xy=1e-4)
    cfg2 = dataclasses.replace(cfg, teacher_forcing_reactive_replay=tf_rr)
    _, buf1, *_ = reactive_replay(cfg2, model, params, batch, jax.random.PRNGKey(1))
    f0 = int(np.asarray(buf0.mask_teacher_forcing).sum())
    f1 = int(np.asarray(buf1.mask_teacher_forcing).sum())
    assert f1 > f0


@pytest.mark.slow
def test_joint_future_pred(setup):
    cfg, batch, model, params = setup
    K = 4
    pp, buf = joint_future_pred(cfg, model, params, batch, jax.random.PRNGKey(2), n_joint_future=K)
    n_sc, n_ag = pp.ag_valid.shape[:2]
    assert buf.pred_pose.shape == (n_sc, K, n_ag, cfg.time_step_end, 3)
    assert buf.log_prob.shape == (n_sc, K, n_ag)
    assert np.isfinite(np.asarray(buf.pred_pose)).all()
    # futures differ (different latent/navi samples)
    p = np.asarray(buf.pred_pose)
    valid = np.asarray(buf.pred_valid)
    if valid[:, 0].sum() > 0:
        diffs = np.abs(p[:, 0] - p[:, 1])[valid[:, 0] & valid[:, 1]]
        assert diffs.sum() > 0


@pytest.mark.slow
def test_womd_post_processing(setup):
    cfg, batch, model, params = setup
    rng = np.random.default_rng(0)
    n_sc, K, n_ag, n_step = 2, 8, 4, 20
    trajs = jnp.asarray(rng.normal(size=(n_sc, K, n_ag, n_step, 3)).astype(np.float32)) * 10
    scores = jnp.asarray(rng.normal(size=(n_sc, K, n_ag)).astype(np.float32))
    ag_type = jnp.asarray(np.eye(3, dtype=bool)[rng.integers(0, 3, (n_sc, n_ag))])
    out = womd_post_process(cfg.womd_post, ag_type, trajs, scores, track_future_samples=n_step)
    k_pred = cfg.womd_post.k_pred
    n_2hz = len(range(4, n_step, 5))
    assert out["trajs"].shape == (n_sc, n_ag, k_pred, n_2hz, 3)
    assert out["scores"].shape == (n_sc, n_ag, k_pred)
    s = np.asarray(out["scores"])
    np.testing.assert_allclose(s.sum(-1), 1.0, atol=1e-5)
    assert (s >= 0).all()

    # topk picks the highest scores
    t0 = jax.nn.softmax(jnp.swapaxes(scores, 1, 2), -1)
    tk, sk = traj_topk(jnp.swapaxes(trajs, 1, 2), t0, k_pred)
    expected = np.sort(np.asarray(t0), -1)[..., -k_pred:]
    np.testing.assert_allclose(np.sort(np.asarray(sk) * np.asarray(t0).sum(), -1).sum(), np.asarray(sk).sum() * np.asarray(t0).sum(), rtol=1e-4)

    # mpa_nms: two identical trajectories -> lower-score one suppressed
    trajs2 = jnp.zeros((1, 1, 2, 5, 3))
    scores2 = jnp.asarray([[[0.7, 0.3]]])
    s2 = np.asarray(mpa_nms(trajs2, scores2, (2.0, 2.0, 2.0), True, jnp.asarray([[[True, False, False]]])))
    assert s2[0, 0, 1] < 0.01 and s2[0, 0, 0] > 0.98


def test_mtr_nms_unique_selection():
    """Selected modes are excluded with a -inf mask (not the reference's -2.0
    offset), so the k_pred picks are distinct for ANY score scale — including
    scores close to 0 where `s - 2.0` would still work, and large scores where
    it would not."""
    from trafficbotsv15_tpu.eval.womd_post_processing import mtr_nms

    rng = np.random.default_rng(3)
    n_sc, n_ag, K, n_step = 2, 3, 6, 10
    trajs = jnp.asarray(rng.normal(size=(n_sc, n_ag, K, n_step, 3)).astype(np.float32)) * 50
    ag_type = jnp.asarray(np.eye(3, dtype=bool)[rng.integers(0, 3, (n_sc, n_ag))])
    for scale in (1.0, 100.0):
        scores = jnp.asarray(rng.random((n_sc, n_ag, K)).astype(np.float32)) * scale
        trajs_k, scores_k = mtr_nms(trajs, scores, 4, (2.0, 2.0, 2.0), True, ag_type)
        # per (scene, agent): all 4 selected trajectories must be distinct modes
        tk = np.asarray(trajs_k)
        for i in range(n_sc):
            for j in range(n_ag):
                flat = tk[i, j].reshape(4, -1)
                assert len({tuple(row) for row in flat}) == 4, (i, j, scale)
        s = np.asarray(scores_k)
        assert np.isfinite(s).all()
        np.testing.assert_allclose(s.sum(-1), 1.0, atol=1e-5)


@pytest.mark.slow
def test_womd_aggr_under_jit(setup):
    """The EM aggregation path (aggr_thresh) runs host-side via pure_callback:
    every caller of womd_post_process is jitted (runner.py step functions), so
    the mode must trace — regression for np.asarray on tracers."""
    import dataclasses

    cfg, *_ = setup
    rng = np.random.default_rng(1)
    n_sc, K, n_ag, n_step = 1, 8, 3, 20
    trajs = jnp.asarray(rng.normal(size=(n_sc, K, n_ag, n_step, 3)).astype(np.float32)) * 10
    scores = jnp.asarray(rng.normal(size=(n_sc, K, n_ag)).astype(np.float32))
    ag_type = jnp.asarray(np.eye(3, dtype=bool)[rng.integers(0, 3, (n_sc, n_ag))])
    pcfg = dataclasses.replace(cfg.womd_post, aggr_thresh=(2.0,), n_iter_em=3)

    out = jax.jit(lambda t, s: womd_post_process(pcfg, ag_type, t, s, track_future_samples=n_step))(
        trajs, scores)
    k_pred = pcfg.k_pred
    assert out["trajs"].shape == (n_sc, n_ag, k_pred, len(range(4, n_step, 5)), 3)
    s = np.asarray(out["scores"])
    np.testing.assert_allclose(s.sum(-1), 1.0, atol=1e-5)
    assert np.isfinite(np.asarray(out["trajs"])).all()


@pytest.mark.slow
def test_wosac_filter_and_global(setup):
    cfg, batch, model, params = setup
    K = 4
    pp, buf = joint_future_pred(cfg, model, params, batch, jax.random.PRNGKey(4), n_joint_future=K)
    trajs = filter_futures(cfg.wosac_post, buf, pp.ag_role, cfg.time_step_current)
    assert trajs.shape[1] == K  # K <= 32: passthrough
    center = jnp.asarray([[10.0, -5.0], [0.0, 3.0]])
    yaw = jnp.asarray([0.5, -1.0])
    g = to_global_frame(trajs, center, yaw)
    assert g.shape == trajs.shape
    # round trip: transforming a known point
    local = np.asarray(trajs[0, 0, 0, 0, :2])
    expect = local @ np.array([[np.cos(0.5), np.sin(0.5)], [-np.sin(0.5), np.cos(0.5)]]) + np.asarray(center[0])
    np.testing.assert_allclose(np.asarray(g[0, 0, 0, 0, :2]), expect, atol=1e-4)


@pytest.mark.slow
def test_scan_unroll_equivalent(setup):
    """scan_unroll is a pure scheduling knob: unroll=2 reproduces unroll=1
    rollouts bit-for-bit at the same PRNG key."""
    import dataclasses

    cfg, batch, model, params = setup
    _, buf1, *_ = reactive_replay(cfg, model, params, batch, jax.random.PRNGKey(9))
    cfg2 = dataclasses.replace(cfg, scan_unroll=2)
    _, buf2, *_ = reactive_replay(cfg2, model, params, batch, jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(buf1.pred_valid), np.asarray(buf2.pred_valid))
    np.testing.assert_allclose(np.asarray(buf1.pred_pose), np.asarray(buf2.pred_pose),
                               rtol=1e-6, atol=1e-6)
