"""Tests for the native WOSAC realism likelihood machinery."""

import numpy as np
import jax.numpy as jnp
import pytest

from trafficbotsv15_tpu.eval.wosac_likelihood import (
    HistogramCfg,
    aggregate_metametric,
    bernoulli_log_likelihood,
    compute_scenario_likelihoods,
    histogram_log_likelihood,
    kinematic_features,
)

RNG = np.random.default_rng(0)


def test_kinematic_features():
    # straight line at 5 m/s, heading 0
    n = 20
    trajs = np.zeros((1, n, 3), np.float32)
    trajs[0, :, 0] = np.arange(n) * 0.5  # 0.5 m per 0.1 s = 5 m/s
    ls, la, ans, aa = kinematic_features(jnp.asarray(trajs))
    np.testing.assert_allclose(np.asarray(ls), 5.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(la), 0.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ans), 0.0, atol=1e-4)


def test_histogram_likelihood_prefers_matching():
    cfg = HistogramCfg(0.0, 10.0, 50)
    K, n_ag, n_step = 8, 2, 10
    sim = np.full((K, n_ag, n_step), 5.0, np.float32)
    sim_valid = np.ones((K, n_ag, n_step), bool)
    log_match = np.full((n_ag, n_step), 5.0, np.float32)
    log_miss = np.full((n_ag, n_step), 9.0, np.float32)
    lv = np.ones((n_ag, n_step), bool)
    s_match, c_match = histogram_log_likelihood(jnp.asarray(sim), jnp.asarray(log_match), jnp.asarray(sim_valid), jnp.asarray(lv), cfg)
    s_miss, c_miss = histogram_log_likelihood(jnp.asarray(sim), jnp.asarray(log_miss), jnp.asarray(sim_valid), jnp.asarray(lv), cfg)
    assert float(s_match[0] / c_match[0]) > float(s_miss[0] / c_miss[0]) + 2.0


def test_bernoulli_likelihood():
    sim = jnp.asarray(np.zeros((32, 3), bool))  # no sim collisions
    log_no = jnp.asarray([False, False, False])
    log_yes = jnp.asarray([True, True, True])
    assert float(bernoulli_log_likelihood(sim, log_no).mean()) > -0.01
    assert float(bernoulli_log_likelihood(sim, log_yes).mean()) < -5.0


def test_aggregate_buckets():
    fields = {k: jnp.asarray(0.8) for k in (
        "linear_speed_likelihood", "linear_acceleration_likelihood",
        "angular_speed_likelihood", "angular_acceleration_likelihood",
        "distance_to_nearest_object_likelihood", "collision_indication_likelihood",
        "time_to_collision_likelihood", "distance_to_road_edge_likelihood",
        "offroad_indication_likelihood")}
    out = aggregate_metametric(fields)
    np.testing.assert_allclose(float(out["metametric"]), 0.8, atol=1e-6)
    for b in ("kinematic_metrics", "interactive_metrics", "map_based_metrics"):
        np.testing.assert_allclose(float(out[b]), 0.8, atol=1e-6)


@pytest.mark.slow
def test_scenario_likelihoods_end_to_end():
    K, n_ag, n_step = 4, 3, 12
    base = np.zeros((n_ag, n_step, 3), np.float32)
    for a in range(n_ag):
        base[a, :, 0] = np.arange(n_step) * 0.8 + a * 20  # spread out, no collisions
        base[a, :, 1] = a * 20
    sim = np.stack([base + RNG.normal(scale=0.05, size=base.shape).astype(np.float32) for _ in range(K)])
    ag_size = np.tile(np.array([[4.0, 2.0, 1.5]], np.float32), (n_ag, 1))
    road_edge = np.zeros((5, 2, 2), np.float32)
    road_edge[:, 0, 1] = -30.0
    road_edge[:, 1, 1] = -30.0
    road_edge[:, 0, 0] = np.arange(5) * 10.0
    road_edge[:, 1, 0] = np.arange(5) * 10.0 + 10.0
    out = compute_scenario_likelihoods(
        jnp.asarray(sim), jnp.ones(n_ag, bool), jnp.asarray(base), jnp.ones((n_ag, n_step), bool),
        jnp.asarray(ag_size), jnp.asarray(road_edge), jnp.ones(5, bool),
        sim_offroad=jnp.zeros((K, n_ag), bool), logged_offroad=jnp.zeros(n_ag, bool),
    )
    for k, v in out.items():
        assert np.isfinite(float(v)), k
        assert 0.0 <= float(v) <= 1.0 + 1e-6, (k, float(v))
    # realistic sim (matching logged) should score a high metametric
    assert float(out["metametric"]) > 0.3
    assert float(out["collision_indication_likelihood"]) > 0.9


def test_histogram_golden_hand_computed():
    """Golden: hand-computed smoothed-histogram log-likelihood on a tiny bundle."""
    from trafficbotsv15_tpu.eval.wosac_likelihood import HistogramCfg, histogram_log_likelihood

    cfg = HistogramCfg(0.0, 4.0, 4, additive_smoothing=0.5)
    # K=2 rollouts, 1 agent, 3 steps; bins of width 1
    sim = jnp.asarray([[[0.5, 1.5, 1.5]], [[2.5, 1.5, 0.5]]])  # bins 0,1,1 / 2,1,0
    logged = jnp.asarray([[1.5, 3.5, 0.5]])  # bins 1, 3, 0
    v = jnp.ones((2, 1, 3), bool)
    lv = jnp.ones((1, 3), bool)
    # counts: bin0=2, bin1=3, bin2=1, bin3=0; total=6; smoothed p = (c+.5)/(6+2)
    p = (np.array([2, 3, 1, 0]) + 0.5) / 8.0
    expected = (np.log(p[1]) + np.log(p[3]) + np.log(p[0])) / 3.0
    ll_sum, ll_cnt = histogram_log_likelihood(sim, logged, v, lv, cfg)
    assert int(ll_cnt[0]) == 3
    np.testing.assert_allclose(float(ll_sum[0] / ll_cnt[0]), expected, rtol=1e-6)


def test_bernoulli_golden_hand_computed():
    from trafficbotsv15_tpu.eval.wosac_likelihood import bernoulli_log_likelihood

    sim_flag = jnp.asarray([[True], [False], [False], [True]])  # K=4, 2 collisions
    p = (2 + 0.001) / (4 + 0.002)
    got_true = float(bernoulli_log_likelihood(sim_flag, jnp.asarray([True]), 0.001)[0])
    got_false = float(bernoulli_log_likelihood(sim_flag, jnp.asarray([False]), 0.001)[0])
    np.testing.assert_allclose(got_true, np.log(p), rtol=1e-6)
    np.testing.assert_allclose(got_false, np.log(1 - p), rtol=1e-6)


def test_flat_sample_mean_pooling():
    """Likelihood pooling is the official FLAT mean over valid agent-step
    samples (`_reduce_average_with_validity`), not a per-agent equal-weight
    average: an agent valid for 1 step contributes 1 sample."""
    from trafficbotsv15_tpu.eval.wosac_likelihood import _avg_exp_flat

    a, b = -0.1, -5.0
    ll_sum = jnp.asarray([9 * a, 1 * b])
    cnt = jnp.asarray([9, 1])
    got = float(_avg_exp_flat(ll_sum, cnt, jnp.asarray([True, True])))
    np.testing.assert_allclose(got, np.exp((9 * a + b) / 10.0), rtol=1e-6)
    assert not np.isclose(got, np.exp((a + b) / 2.0))


@pytest.mark.slow
def test_validity_gap_does_not_corrupt_kinematics():
    """A mid-track invalid GT step (zero-padded pose) must not leak garbage
    speeds/accelerations into the logged likelihoods: diff-feature validity
    requires every contributing step valid, not just the trailing one."""
    K, n_ag, n_step = 8, 2, 20
    base = np.zeros((n_ag, n_step, 3), np.float32)
    base[:, :, 0] = np.arange(n_step, dtype=np.float32) * 0.5  # 5 m/s
    base[0, :, 1], base[1, :, 1] = 0.0, 30.0
    sim = np.repeat(base[None], K, 0)
    logged = base.copy()
    lv = np.ones((n_ag, n_step), bool)
    # invalidate one mid step; packed pose of an invalid step is zeros
    logged[:, 10] = 0.0
    lv[:, 10] = False
    ag_size = np.tile(np.array([[4.0, 2.0, 1.5]], np.float32), (n_ag, 1))
    out = compute_scenario_likelihoods(
        jnp.asarray(sim), jnp.ones(n_ag, bool), jnp.asarray(logged), jnp.asarray(lv),
        jnp.asarray(ag_size),
    )
    # pre-fix: |pos - 0|/dt garbage (~50-80 m/s) scored in near-empty bins
    # cratered these to ~exp(-12-weighted) values
    for f in ("linear_speed_likelihood", "linear_acceleration_likelihood",
              "angular_speed_likelihood", "angular_acceleration_likelihood"):
        assert float(out[f]) > 0.5, (f, float(out[f]))


def test_challenge_2024_config_consistency():
    """Weights sum to 1, buckets partition the fields, histograms cover clamps."""
    from trafficbotsv15_tpu.eval.wosac_likelihood import (
        BUCKETS, CHALLENGE_2024_CONFIG, FIELD_WEIGHTS,
    )

    np.testing.assert_allclose(sum(FIELD_WEIGHTS.values()), 1.0, rtol=1e-9)
    bucket_fields = sorted(f for fs in BUCKETS.values() for f in fs)
    assert bucket_fields == sorted(FIELD_WEIGHTS)
    ttc = CHALLENGE_2024_CONFIG["time_to_collision"]["histogram"]
    assert ttc.val_max == 5.0  # must cover the max_ttc clamp in time_to_collision()
