"""Native WOSAC realism likelihoods (package-free JAX implementation).

The official WOSAC metric (wosac.py in the reference, Waymo's
compute_scenario_metrics_for_bundle) scores, per scenario and agent, the
log-likelihood of the LOGGED (ground-truth) feature values under the empirical
distribution of the K=32 simulated rollouts, then aggregates a weighted
"realism metametric" over three buckets (kinematic / interactive / map).

This module reimplements that mechanism natively so WOSAC-style validation
runs on TPU without the waymo_open_dataset package:

  - feature extraction from rollout trajectories (linear/angular speed and
    acceleration; distance to nearest object via the exact WOSAC signed box
    distance; collision indication; time-to-collision; distance to road edge;
    offroad indication)
  - histogram likelihood estimation with additive smoothing (independent
    timesteps), Bernoulli likelihood for indications
  - bucket aggregation with the challenge's published weighting scheme.

Bin edges / weights / smoothing come from CHALLENGE_2024_CONFIG below (a
transcription of the published 2024 challenge textproto — see the provenance
note there and scripts/validate_wosac_config.py). Use
eval.wosac_metrics.WOSACMetrics for official leaderboard numbers.

KNOWN ESTIMATOR DEVIATION — time-to-collision: the official package computes
TTC against the lead object from trajectory-pair geometry
(`interaction_features.compute_time_to_collision_with_object_in_front`,
box-projected along heading); `time_to_collision` below uses a same-lane
leader heuristic (agent ahead within half-width lateral offset in the ego
frame, constant-velocity closing time). The TTC bucket therefore tracks but
does not reproduce the official number — treat `realism_meta` from this
module (e.g. the dryrun's printed value) as an estimator. The collision /
distance-to-object features use the exact WOSAC signed box distance and carry
no such caveat.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from trafficbotsv15_tpu.ops.transform import cast_rad
from trafficbotsv15_tpu.sim.wosac_collision import (
    EXTREMELY_LARGE_DISTANCE,
    pairwise_signed_distance_soa,
)


@dataclasses.dataclass(frozen=True)
class HistogramCfg:
    val_min: float
    val_max: float
    num_bins: int
    additive_smoothing: float = 0.001


# ---------------------------------------------------------------------------
# 2024 challenge configuration
#
# Transcription of the public waymo_open_dataset
# `wdl_limited/sim_agents_metrics/challenge_2024_config.textproto` (the file
# the reference loads at src/models/metrics/wosac.py:99-105). This image has
# neither the package nor network access, so the values below are transcribed
# from the published config; run `scripts/validate_wosac_config.py` on a
# machine with waymo_open_dataset installed to diff every constant against the
# shipped textproto (it exits non-zero and prints a per-field report on any
# mismatch). The estimator mechanics (histogram clipping, additive smoothing,
# per-agent pooling over rollouts/steps, Bernoulli as a smoothed 2-bin
# histogram, weighted metametric) are tested against hand-computed goldens in
# tests/test_wosac_likelihood.py.
# ---------------------------------------------------------------------------
CHALLENGE_2024_CONFIG: Dict[str, Dict] = {
    "linear_speed": dict(histogram=HistogramCfg(0.0, 32.0, 64),
                         independent_timesteps=True, metametric_weight=0.05),
    "linear_acceleration": dict(histogram=HistogramCfg(-12.0, 12.0, 48),
                                independent_timesteps=True, metametric_weight=0.05),
    "angular_speed": dict(histogram=HistogramCfg(-3.2, 3.2, 64),
                          independent_timesteps=True, metametric_weight=0.05),
    "angular_acceleration": dict(histogram=HistogramCfg(-6.4, 6.4, 64),
                                 independent_timesteps=True, metametric_weight=0.05),
    "distance_to_nearest_object": dict(histogram=HistogramCfg(-10.0, 40.0, 50),
                                       independent_timesteps=True, metametric_weight=0.1),
    "collision_indication": dict(bernoulli_smoothing=0.001,
                                 independent_timesteps=False, metametric_weight=0.25),
    "time_to_collision": dict(histogram=HistogramCfg(0.0, 5.0, 25),
                              independent_timesteps=True, metametric_weight=0.1),
    "distance_to_road_edge": dict(histogram=HistogramCfg(-5.0, 5.0, 50),
                                  independent_timesteps=True, metametric_weight=0.1),
    "offroad_indication": dict(bernoulli_smoothing=0.001,
                               independent_timesteps=False, metametric_weight=0.25),
}

FEATURE_CONFIG: Dict[str, HistogramCfg] = {
    name: cfg["histogram"] for name, cfg in CHALLENGE_2024_CONFIG.items() if "histogram" in cfg
}

# metametric weights per likelihood field (bucket-normalized below)
FIELD_WEIGHTS = {
    f"{name}_likelihood": cfg["metametric_weight"] for name, cfg in CHALLENGE_2024_CONFIG.items()
}
BUCKETS = {
    "kinematic_metrics": [
        "linear_speed_likelihood", "linear_acceleration_likelihood",
        "angular_speed_likelihood", "angular_acceleration_likelihood",
    ],
    "interactive_metrics": [
        "distance_to_nearest_object_likelihood", "collision_indication_likelihood",
        "time_to_collision_likelihood",
    ],
    "map_based_metrics": ["distance_to_road_edge_likelihood", "offroad_indication_likelihood"],
}


# --------------------------------------------------------------- features
def kinematic_features(trajs: jnp.ndarray, dt: float = 0.1):
    """trajs [..., n_step, 3] -> (lin_speed, lin_acc, ang_speed, ang_acc), each [..., n_step-k]."""
    d = jnp.diff(trajs[..., :2], axis=-2)
    lin_speed = jnp.linalg.norm(d, axis=-1) / dt
    lin_acc = jnp.diff(lin_speed, axis=-1) / dt
    ang_speed = cast_rad(jnp.diff(trajs[..., 2], axis=-1)) / dt
    ang_acc = jnp.diff(ang_speed, axis=-1) / dt
    return lin_speed, lin_acc, ang_speed, ang_acc


def pairwise_signed_distance(pose: jnp.ndarray, ag_size: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Min signed distance to any other valid agent [n_b, n_ag] (WOSAC
    geometry; SoA planes — the AoS [n_pair, 4, 2] layout padded 16-32x on TPU
    when batched over rollouts x steps)."""
    return jnp.min(pairwise_signed_distance_soa(pose, ag_size, valid), axis=2)


def time_to_collision(pose, spd, ag_size, valid, max_ttc: float = 5.0) -> jnp.ndarray:
    """Constant-velocity lead-vehicle TTC per agent [n_b, n_ag] (simplified:
    same-lane leader = agent ahead within half-width lateral offset)."""
    c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
    dp = pose[:, None, :, :2] - pose[:, :, None, :2]  # i -> j
    lon = dp[..., 0] * c[:, :, None] + dp[..., 1] * s[:, :, None]
    lat = -dp[..., 0] * s[:, :, None] + dp[..., 1] * c[:, :, None]
    half_w = (ag_size[:, :, None, 1] + ag_size[:, None, :, 1]) * 0.5
    length_gap = lon - (ag_size[:, :, None, 0] + ag_size[:, None, :, 0]) * 0.5
    ahead = (length_gap > 0) & (jnp.abs(lat) < half_w)
    closing = spd[:, :, None] - spd[:, None, :]  # >0 means closing in
    ttc = jnp.where(ahead & (closing > 0.1), length_gap / jnp.maximum(closing, 0.1), max_ttc)
    invalid = ~(valid[:, :, None] & valid[:, None, :]) | jnp.eye(valid.shape[1], dtype=bool)[None]
    ttc = jnp.where(invalid, max_ttc, ttc)
    return jnp.clip(jnp.min(ttc, axis=2), 0.0, max_ttc)


def distance_to_road_edge(pose, road_edge, road_edge_valid) -> jnp.ndarray:
    """Distance to the nearest road-edge segment [n_b, n_ag] (sign: + = inside
    is not resolved here; offroad indication uses the rule checker).

    SoA: x/y handled as separate [n_b, n_ag, n_seg] planes (segment axis
    minor) — the AoS [.., n_seg, 2] layout pads 64x on the (8,128) registers."""
    ax, ay = road_edge[..., 0, 0], road_edge[..., 0, 1]  # [n_b, n_seg]
    bx, by = road_edge[..., 1, 0], road_edge[..., 1, 1]
    abx, aby = bx - ax, by - ay
    denom = (abx * abx + aby * aby + 1e-9)[:, None]  # [n_b, 1, n_seg]
    px, py = pose[..., 0][..., None], pose[..., 1][..., None]  # [n_b, n_ag, 1]
    t = jnp.clip(((px - ax[:, None]) * abx[:, None] + (py - ay[:, None]) * aby[:, None]) / denom,
                 0.0, 1.0)
    dx = px - (ax[:, None] + t * abx[:, None])
    dy = py - (ay[:, None] + t * aby[:, None])
    d = jnp.sqrt(dx * dx + dy * dy)
    d = jnp.where(road_edge_valid[:, None, :], d, EXTREMELY_LARGE_DISTANCE)
    return jnp.min(d, axis=2)


# ------------------------------------------------------------- likelihoods
def histogram_log_likelihood(sim: jnp.ndarray, logged: jnp.ndarray, sim_valid, logged_valid,
                             cfg: HistogramCfg) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-agent (sum, count) of logged log-likelihoods under the sim histogram.

    sim: [K, n_ag, n_step], logged: [n_ag, n_step]; valid masks alike.
    Histogram pooled over rollouts and steps per agent (independent timesteps).
    Returns sums/counts rather than per-agent means so callers can take the
    official estimator's FLAT mean over all valid agent-step samples
    (sim_agents_metrics `_reduce_average_with_validity`), not a per-agent
    equal-weight average.
    """
    edges_scale = cfg.num_bins / (cfg.val_max - cfg.val_min)
    sim_bin = jnp.clip(((sim - cfg.val_min) * edges_scale).astype(jnp.int32), 0, cfg.num_bins - 1)
    onehot = jax.nn.one_hot(sim_bin, cfg.num_bins) * sim_valid[..., None]
    counts = jnp.sum(onehot, axis=(0, 2))  # [n_ag, bins]
    probs = (counts + cfg.additive_smoothing) / (
        jnp.sum(counts, -1, keepdims=True) + cfg.additive_smoothing * cfg.num_bins
    )
    log_bin = jnp.log(probs)
    logged_bin = jnp.clip(((logged - cfg.val_min) * edges_scale).astype(jnp.int32), 0, cfg.num_bins - 1)
    ll = jnp.take_along_axis(log_bin, logged_bin, axis=-1)  # [n_ag, n_step]
    return jnp.sum(jnp.where(logged_valid, ll, 0.0), -1), jnp.sum(logged_valid, -1)  # [n_ag] x2


def bernoulli_log_likelihood(sim_flag: jnp.ndarray, logged_flag: jnp.ndarray,
                             smoothing: float = 0.001) -> jnp.ndarray:
    """sim_flag [K, n_ag] bool, logged_flag [n_ag] bool -> per-agent loglik.

    Matches the official estimator: a Bernoulli is a 2-bin histogram with
    additive smoothing, p = (count + eps) / (K + 2*eps), eps from the 2024
    challenge config (CHALLENGE_2024_CONFIG[*]["bernoulli_smoothing"])."""
    p = (jnp.sum(sim_flag, 0) + smoothing) / (sim_flag.shape[0] + 2 * smoothing)
    return jnp.where(logged_flag, jnp.log(p), jnp.log1p(-p))


def aggregate_metametric(likelihoods: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Weighted buckets + realism metametric (wosac.py:79-97 aggregation).

    Weights renormalize over the fields actually present (road-edge/offroad
    fields are optional when no map is supplied), so a missing optional field
    degrades gracefully instead of deflating the metametric/bucket scores.
    With all 9 fields present this equals the official fixed weighting."""
    out = dict(likelihoods)
    total_w = sum(FIELD_WEIGHTS[k] for k in FIELD_WEIGHTS if k in likelihoods)
    meta = sum(FIELD_WEIGHTS[k] * likelihoods[k] for k in FIELD_WEIGHTS if k in likelihoods)
    out["metametric"] = meta / total_w
    for bucket, fields in BUCKETS.items():
        present = [f for f in fields if f in likelihoods]
        if not present:
            continue
        w = sum(FIELD_WEIGHTS[f] for f in present)
        out[bucket] = sum(FIELD_WEIGHTS[f] * likelihoods[f] for f in present) / w
    return out


def compute_scenario_likelihoods(
    sim_trajs: jnp.ndarray,  # [K, n_ag, n_step, 3] simulated futures (global or scene frame)
    sim_valid: jnp.ndarray,  # [n_ag] (constant over future)
    logged_trajs: jnp.ndarray,  # [n_ag, n_step, 3] GT future
    logged_valid: jnp.ndarray,  # [n_ag, n_step]
    ag_size: jnp.ndarray,  # [n_ag, 3]
    road_edge: Optional[jnp.ndarray] = None,  # [n_seg, 2, 2]
    road_edge_valid: Optional[jnp.ndarray] = None,
    sim_offroad: Optional[jnp.ndarray] = None,  # [K, n_ag] bool
    logged_offroad: Optional[jnp.ndarray] = None,  # [n_ag] bool
    dt: float = 0.1,
) -> Dict[str, jnp.ndarray]:
    """Scenario-level likelihood fields, averaged over valid agents."""
    K, n_ag, n_step, _ = sim_trajs.shape
    v_step = logged_valid
    v_step_sim = jnp.broadcast_to(sim_valid[None, :, None], (K, n_ag, n_step))

    ls_s, la_s, as_s, aa_s = kinematic_features(sim_trajs, dt)
    ls_l, la_l, as_l, aa_l = kinematic_features(logged_trajs, dt)

    # diff-feature validity requires EVERY contributing step valid: at a GT
    # validity rising edge the packed pose of the invalid step is zeros, so a
    # trailing-step-only mask would score |pos[t] - 0|/dt garbage speeds
    # against the sim histogram. speed[i] uses steps i,i+1; acc[i] additionally
    # uses step i+2.
    v1 = v_step[..., :-1] & v_step[..., 1:]  # [n_ag, n_step-1]
    v2 = v1[..., :-1] & v1[..., 1:]  # [n_ag, n_step-2]
    v1_sim = v_step_sim[..., :-1] & v_step_sim[..., 1:]
    v2_sim = v1_sim[..., :-1] & v1_sim[..., 1:]

    fields = {}
    for name, sim_f, log_f, sv, lv in (
        ("linear_speed", ls_s, ls_l, v1_sim, v1),
        ("linear_acceleration", la_s, la_l, v2_sim, v2),
        ("angular_speed", as_s, as_l, v1_sim, v1),
        ("angular_acceleration", aa_s, aa_l, v2_sim, v2),
    ):
        ll_sum, ll_cnt = histogram_log_likelihood(sim_f, log_f, sv, lv, FEATURE_CONFIG[name])
        fields[f"{name}_likelihood"] = _avg_exp_flat(ll_sum, ll_cnt, sim_valid)

    # distance to nearest object per step: steps vmapped (SoA planes tile the
    # vector registers), rollouts mapped sequentially (lax.map) to bound the
    # pairwise-geometry working set at [n_step, 8, n_ag^2] per iteration
    def per_step_dist(pose_t, valid_t):
        return pairwise_signed_distance(pose_t[None], ag_size[None, :, :2], valid_t[None])[0]

    sim_dist = jax.lax.map(lambda tr: jax.vmap(per_step_dist, in_axes=(0, None))(
        jnp.swapaxes(tr, 0, 1), sim_valid), sim_trajs)  # [K, n_step, n_ag]
    sim_dist = jnp.swapaxes(sim_dist, 1, 2)
    log_dist = jax.vmap(per_step_dist, in_axes=(0, 0))(
        jnp.swapaxes(logged_trajs, 0, 1), jnp.swapaxes(logged_valid, 0, 1))
    log_dist = jnp.swapaxes(log_dist, 0, 1)
    cfgd = FEATURE_CONFIG["distance_to_nearest_object"]
    ll_sum, ll_cnt = histogram_log_likelihood(jnp.clip(sim_dist, cfgd.val_min, cfgd.val_max),
                                              jnp.clip(log_dist, cfgd.val_min, cfgd.val_max),
                                              v_step_sim, v_step, cfgd)
    fields["distance_to_nearest_object_likelihood"] = _avg_exp_flat(ll_sum, ll_cnt, sim_valid)

    # collision indication: any step with negative distance
    sim_col = jnp.any((sim_dist < 0) & v_step_sim, axis=-1)
    log_col = jnp.any((log_dist < 0) & v_step, axis=-1)
    fields["collision_indication_likelihood"] = _avg_exp(
        bernoulli_log_likelihood(
            sim_col, log_col, CHALLENGE_2024_CONFIG["collision_indication"]["bernoulli_smoothing"]
        ),
        sim_valid)

    # TTC
    def per_step_ttc(pose_t, spd_t, valid_t):
        return time_to_collision(pose_t[None], spd_t[None], ag_size[None], valid_t[None])[0]

    # speed at step t = speed over (t-1, t); zero where either step is invalid
    # so rising-edge garbage does not drive the closing-speed TTC test
    sim_spd = jnp.concatenate(
        [jnp.where(v1_sim[..., :1], ls_s[..., :1], 0.0), jnp.where(v1_sim, ls_s, 0.0)], axis=-1)
    log_spd = jnp.concatenate(
        [jnp.where(v1[..., :1], ls_l[..., :1], 0.0), jnp.where(v1, ls_l, 0.0)], axis=-1)
    sim_ttc = jax.vmap(lambda tr, sp: jax.vmap(per_step_ttc, in_axes=(0, 0, None))(
        jnp.swapaxes(tr, 0, 1), jnp.swapaxes(sp, 0, 1), sim_valid))(sim_trajs, sim_spd)
    sim_ttc = jnp.swapaxes(sim_ttc, 1, 2)
    log_ttc = jnp.swapaxes(jax.vmap(per_step_ttc, in_axes=(0, 0, 0))(
        jnp.swapaxes(logged_trajs, 0, 1), jnp.swapaxes(log_spd, 0, 1),
        jnp.swapaxes(logged_valid, 0, 1)), 0, 1)
    ll_sum, ll_cnt = histogram_log_likelihood(
        sim_ttc, log_ttc, v_step_sim, v_step, FEATURE_CONFIG["time_to_collision"])
    fields["time_to_collision_likelihood"] = _avg_exp_flat(ll_sum, ll_cnt, sim_valid)

    if road_edge is not None:
        def edge_dist(tr):  # [n_ag, n_step, 3] -> [n_ag, n_step]
            d = jax.vmap(lambda pose_t: distance_to_road_edge(
                pose_t[None], road_edge[None], road_edge_valid[None])[0])(jnp.swapaxes(tr, 0, 1))
            return jnp.swapaxes(d, 0, 1)

        cfge = FEATURE_CONFIG["distance_to_road_edge"]
        sim_red = jnp.clip(jax.lax.map(edge_dist, sim_trajs), cfge.val_min, cfge.val_max)
        log_red = jnp.clip(edge_dist(logged_trajs), cfge.val_min, cfge.val_max)
        ll_sum, ll_cnt = histogram_log_likelihood(sim_red, log_red, v_step_sim, v_step, cfge)
        fields["distance_to_road_edge_likelihood"] = _avg_exp_flat(ll_sum, ll_cnt, sim_valid)
    if sim_offroad is not None and logged_offroad is not None:
        fields["offroad_indication_likelihood"] = _avg_exp(
            bernoulli_log_likelihood(
                sim_offroad, logged_offroad,
                CHALLENGE_2024_CONFIG["offroad_indication"]["bernoulli_smoothing"],
            ),
            sim_valid)

    return aggregate_metametric(fields)


def _avg_exp(per_agent_ll: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """exp(mean loglik) over valid agents -> scalar likelihood in (0, 1].

    For one-sample-per-agent fields (the Bernoulli indications) this IS the
    official flat sample mean; histogram fields use _avg_exp_flat."""
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.exp(jnp.sum(jnp.where(valid, per_agent_ll, 0.0)) / n)


def _avg_exp_flat(ll_sum: jnp.ndarray, ll_cnt: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """exp of the FLAT mean log-likelihood over all valid agent-step samples
    (the official `_reduce_average_with_validity` pooling — an agent valid for
    1 step contributes 1 sample, not a full agent's weight)."""
    s = jnp.sum(jnp.where(valid, ll_sum, 0.0))
    n = jnp.maximum(jnp.sum(jnp.where(valid, ll_cnt, 0)), 1)
    return jnp.exp(s / n)


def realism_from_rollout(
    batch: Dict[str, jnp.ndarray],
    pp,  # PreProcessedBatch with GT (validation split)
    jf_buf,  # flattened joint-future RolloutBuffer [n_sc, K, ...]
    step_current: int,
    segment_budget: int = 6144,
) -> Dict[str, jnp.ndarray]:
    """Native realism metametric for a validation batch, per scenario.

    The glue the reference routes through Waymo's package
    (src/models/metrics/wosac.py:51-54 compute_scenario_metrics_for_bundle fed
    at src/pl_modules/waymo_motion.py:649-659): slice the future horizon from
    the K joint-future rollouts and the logged GT, derive road edges from the
    packed map, offroad indications from the rule checker's crossing test, and
    score every likelihood field on-device. Returns a dict of [n_sc] arrays —
    the 9 likelihood fields, bucket aggregates, "metametric", and WOSAC's
    average/min_average displacement errors. Mapped sequentially over the
    scenario axis (lax.map) to bound the pairwise-geometry working set.
    """
    from trafficbotsv15_tpu.sim.rule_checker import _check_run_road_edge, build_road_edges
    from trafficbotsv15_tpu.sim.wosac_collision import get_ag_bbox as _bbox

    road_edge, road_edge_valid = build_road_edges(
        batch["map/valid"], batch["map/type"].astype(bool), batch["map/pos"],
        batch["map/dir"], segment_budget,
    )
    sim = jf_buf.pred_pose[:, :, :, step_current:]  # [n_sc, K, n_ag, n_fut, 3]
    # WOSAC simulates every agent present anywhere in the rollout for the full
    # horizon; per-future validity is spawn-identical across K
    sim_valid = jnp.any(jf_buf.pred_valid[:, :, :, step_current:], axis=(1, 3))  # [n_sc, n_ag]
    logged = pp.gt_pose[:, :, step_current + 1:]  # abs steps 11..90, aligned with sim
    logged_valid = pp.gt_valid[:, :, step_current + 1:]
    ag_size = pp.ag_size

    # offroad indications: sim from the in-scan rule checker accumulators,
    # logged by replaying the same crossing test on GT bboxes
    sim_offroad = jnp.any(
        jf_buf.violation["run_road_edge_this_step"][:, :, :, step_current:], axis=-1
    )  # [n_sc, K, n_ag]
    veh_mask = pp.ag_type[:, :, 0]

    def _offroad_step(args):
        pose_t, valid_t = args
        return _check_run_road_edge(valid_t, _bbox(pose_t, ag_size[..., :2]), veh_mask,
                                    road_edge, road_edge_valid)

    # sequential over steps: the crossing test materializes [n_ag, n_seg, 4]
    # temporaries that pad 32x on TPU — one step at a time keeps it bounded
    logged_offroad = jnp.any(
        jax.lax.map(_offroad_step, (jnp.moveaxis(logged, 2, 0), jnp.moveaxis(logged_valid, 2, 0))),
        axis=0,
    )  # [n_sc, n_ag]

    def one_scenario(args):
        s, sv, l, lv, sz, re, rev, so, lo = args
        fields = compute_scenario_likelihoods(
            s, sv, l, lv, sz, road_edge=re, road_edge_valid=rev,
            sim_offroad=so, logged_offroad=lo,
        )
        # WOSAC's displacement errors (FIELD_NAMES average/min_average_
        # displacement_error): per-agent ADE over valid steps; ADE = mean over
        # K of the agent-averaged per-rollout ADE, minADE = MIN over K of the
        # agent-averaged ADE (tf.reduce_min(tf.reduce_mean(ade, axis=objects)))
        # — NOT a per-agent min, which would cherry-pick the best rollout per
        # agent and report an unachievable composite.
        mask = sv[None, :, None] & lv[None]
        dist = jnp.where(mask, jnp.linalg.norm(s[..., :2] - l[None, ..., :2], axis=-1), 0.0)
        ade_k = jnp.sum(dist, -1) / jnp.maximum(jnp.sum(mask, -1), 1)  # [K, n_ag]
        ag_mask = sv & jnp.any(lv, -1)
        n_ag_v = jnp.maximum(jnp.sum(ag_mask), 1)
        ade_scen = jnp.sum(jnp.where(ag_mask[None], ade_k, 0.0), axis=1) / n_ag_v  # [K]
        fields["average_displacement_error"] = jnp.mean(ade_scen)
        fields["min_average_displacement_error"] = jnp.min(ade_scen)
        return fields

    return jax.lax.map(one_scenario, (
        sim, sim_valid, logged, logged_valid, ag_size,
        road_edge, road_edge_valid, sim_offroad, logged_offroad,
    ))
