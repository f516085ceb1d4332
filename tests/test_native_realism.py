"""realism_from_rollout glue: batch slicing, offroad derivation, aggregation.

The estimator itself (histograms, Bernoulli, bucket weights) is golden-tested
in tests/test_wosac_likelihood.py; here we test the validation-batch glue
that feeds it (the native stand-in for the reference's official WOSAC call at
src/pl_modules/waymo_motion.py:649-659).
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trafficbotsv15_tpu.eval.wosac_likelihood import (
    compute_scenario_likelihoods,
    realism_from_rollout,
)
from trafficbotsv15_tpu.sim.rollout import RolloutBuffer

N_SC, K, N_AG, N_STEP_ABS = 2, 4, 5, 12  # buffer covers abs steps 1..12
STEP_CUR = 2
N_FUT = N_STEP_ABS - STEP_CUR  # future = abs steps 3..12


def _make_inputs(seed=0, noise=0.0):
    rng = np.random.default_rng(seed)
    # GT: smooth forward motion, abs steps 0..12
    t = np.arange(N_STEP_ABS + 1, dtype=np.float32)
    base = np.zeros((N_SC, N_AG, N_STEP_ABS + 1, 3), np.float32)
    for a in range(N_AG):
        base[:, a, :, 0] = 2.0 * t + 10.0 * a  # spaced along x, 2 m/step
        base[:, a, :, 1] = 3.0 * a
    gt_pose = base
    gt_valid = np.ones((N_SC, N_AG, N_STEP_ABS + 1), bool)

    # sim buffer = GT steps 1.. replicated K times (+ optional noise)
    sim = np.repeat(base[:, None, :, 1:], K, axis=1)
    sim = sim + rng.normal(0, noise, sim.shape).astype(np.float32) * np.array([1, 1, 0.1])
    pred_valid = np.ones((N_SC, K, N_AG, N_STEP_ABS), bool)

    zeros_ag = jnp.zeros((N_SC, K, N_AG, N_STEP_ABS))
    buf = RolloutBuffer(
        pred_valid=jnp.asarray(pred_valid),
        pred_pose=jnp.asarray(sim),
        pred_motion=jnp.zeros((N_SC, K, N_AG, N_STEP_ABS, 3)),
        pred_action=jnp.zeros((N_SC, K, N_AG, N_STEP_ABS, 2)),
        action_log_prob=zeros_ag,
        tl_state_nll=jnp.zeros((N_SC, K, 1, N_STEP_ABS)),
        tl_state_nll_invalid=jnp.zeros((N_SC, K, 1, N_STEP_ABS)),
        mask_teacher_forcing=jnp.zeros_like(zeros_ag, dtype=bool),
        diffbar_reward={},
        violation={"run_road_edge_this_step": jnp.zeros_like(zeros_ag, dtype=bool)},
        tl_state=jnp.zeros((N_SC, K, 1, N_STEP_ABS, 5)),
        navi_log_prob=jnp.zeros((N_SC, K, N_AG, 1)),
        navi_log_prob_valid=jnp.zeros((N_SC, K, N_AG, 1)),
    )

    # a straight road edge far below the agents (no offroad)
    n_mp, n_node = 4, 5
    batch = {
        "map/valid": jnp.ones((N_SC, n_mp, n_node), bool),
        "map/type": jnp.asarray(np.eye(11, dtype=np.float32)[np.full((N_SC, n_mp), 4)]),
        "map/pos": jnp.asarray(
            np.stack(np.broadcast_arrays(
                np.arange(n_mp * n_node, dtype=np.float32).reshape(1, n_mp, n_node) * 5.0,
                np.full((1, n_mp, n_node), -50.0), np.zeros((1, n_mp, n_node))), -1)
            .repeat(N_SC, 0)
        ),
        "map/dir": jnp.asarray(np.tile(np.array([5.0, 0, 0], np.float32), (N_SC, n_mp, n_node, 1))),
    }

    pp = dataclasses.make_dataclass("PP", ["gt_pose", "gt_valid", "ag_size", "ag_type"])(
        gt_pose=jnp.asarray(gt_pose),
        gt_valid=jnp.asarray(gt_valid),
        ag_size=jnp.asarray(np.tile(np.array([4.0, 2.0, 1.5], np.float32), (N_SC, N_AG, 1))),
        ag_type=jnp.asarray(np.tile(np.array([True, False, False]), (N_SC, N_AG, 1))),
    )
    return batch, pp, buf


@pytest.mark.slow
def test_perfect_sim_high_likelihood():
    """sim == logged replicated K times -> every likelihood ~1, ADE = 0."""
    batch, pp, buf = _make_inputs(noise=0.0)
    out = realism_from_rollout(batch, pp, buf, STEP_CUR)
    for k, v in out.items():
        assert v.shape == (N_SC,), k
        assert np.all(np.isfinite(np.asarray(v))), k
    assert np.all(np.asarray(out["metametric"]) > 0.9)
    for f in ("linear_speed_likelihood", "collision_indication_likelihood",
              "offroad_indication_likelihood", "distance_to_road_edge_likelihood"):
        assert np.all(np.asarray(out[f]) > 0.9), f
    np.testing.assert_allclose(np.asarray(out["average_displacement_error"]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["min_average_displacement_error"]), 0.0, atol=1e-5)


def test_noise_lowers_metametric():
    batch, pp, buf = _make_inputs(noise=0.0)
    clean = realism_from_rollout(batch, pp, buf, STEP_CUR)
    batch, pp, buf_noisy = _make_inputs(seed=1, noise=3.0)
    noisy = realism_from_rollout(batch, pp, buf_noisy, STEP_CUR)
    assert np.all(np.asarray(noisy["metametric"]) < np.asarray(clean["metametric"]))
    assert np.all(np.asarray(noisy["average_displacement_error"]) > 0.5)


def test_min_ade_is_best_whole_rollout():
    """WOSAC's min-ADE is the min over rollouts of the AGENT-AVERAGED ADE
    (tf.reduce_min(tf.reduce_mean(...))), not a per-agent best-rollout
    cherry-pick (which would report an unachievable composite)."""
    batch, pp, buf = _make_inputs(noise=0.0)
    # rollout k tracks agent k perfectly but offsets every other agent by 2 m
    pose = np.asarray(buf.pred_pose).copy()
    for k in range(K):
        for a in range(N_AG):
            if a != k:
                pose[:, k, a, :, 0] += 2.0
    buf = dataclasses.replace(buf, pred_pose=jnp.asarray(pose))
    out = realism_from_rollout(batch, pp, buf, STEP_CUR)
    expected = 2.0 * (N_AG - 1) / N_AG  # best single rollout's scenario ADE
    np.testing.assert_allclose(np.asarray(out["min_average_displacement_error"]),
                               expected, rtol=1e-5)
    # the cherry-picked composite would be 2.0 / N_AG = 0.4 — must not match
    assert np.all(np.asarray(out["min_average_displacement_error"]) > 1.0)
    np.testing.assert_allclose(np.asarray(out["average_displacement_error"]),
                               expected, rtol=1e-5)


@pytest.mark.slow
def test_glue_matches_direct_call():
    """The batch glue adds no re-scoring: scenario 0 equals a direct
    compute_scenario_likelihoods call on the same slices."""
    batch, pp, buf = _make_inputs(seed=2, noise=0.5)
    out = realism_from_rollout(batch, pp, buf, STEP_CUR)

    from trafficbotsv15_tpu.sim.rule_checker import build_road_edges

    road_edge, road_edge_valid = build_road_edges(
        batch["map/valid"], batch["map/type"].astype(bool), batch["map/pos"], batch["map/dir"]
    )
    direct = compute_scenario_likelihoods(
        buf.pred_pose[0, :, :, STEP_CUR:],
        jnp.any(buf.pred_valid[0, :, :, STEP_CUR:], axis=(0, 2)),
        pp.gt_pose[0, :, STEP_CUR + 1:],
        pp.gt_valid[0, :, STEP_CUR + 1:],
        pp.ag_size[0],
        road_edge=road_edge[0], road_edge_valid=road_edge_valid[0],
        sim_offroad=jnp.zeros((K, N_AG), bool),
        logged_offroad=jnp.zeros((N_AG,), bool),
    )
    for k, v in direct.items():
        np.testing.assert_allclose(np.asarray(out[k][0]), np.asarray(v), rtol=1e-5, err_msg=k)
