"""Rollout logging metrics as running-sum pytrees.

Parity target: /root/reference/src/models/metrics/logging.py (ErrorMetrics,
TrafficRuleMetrics). torchmetrics' dist_reduce_fx="sum" states become plain
dicts of scalar sums; under pjit the jnp.sum over a sharded batch is the
cross-device reduction, and `merge_sums` accumulates across eval steps on
host. `compute_*` performs the final normalization.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from trafficbotsv15_tpu.ops.transform import cast_rad
from trafficbotsv15_tpu.sim.rollout import RolloutBuffer


def error_metric_sums(
    buffer: RolloutBuffer,  # flattened: [n_sc, K=1, n_ag, n_step(, d)]
    gt_valid: jnp.ndarray,  # [n_sc, n_ag, n_step_gt] absolute steps 0..
    gt_pose: jnp.ndarray,
    gt_motion: jnp.ndarray,
    step_start: int = 1,
) -> Dict[str, jnp.ndarray]:
    """Reconstruction errors vs GT (logging.py:19-49). Buffer steps are
    absolute steps [step_start, step_start + n_step)."""
    n_step = buffer.pred_valid.shape[-1]
    gt_valid = gt_valid[:, :, step_start : step_start + n_step]
    gt_pose = gt_pose[:, :, step_start : step_start + n_step]
    gt_motion = gt_motion[:, :, step_start : step_start + n_step]

    pred_valid = buffer.pred_valid[:, 0]
    err_valid = pred_valid & gt_valid
    inv = ~err_valid[..., None]
    err_pose = jnp.where(inv, 0.0, buffer.pred_pose[:, 0] - gt_pose)
    err_motion = jnp.where(inv, 0.0, buffer.pred_motion[:, 0] - gt_motion)
    return {
        "err_counter": jnp.sum(err_valid).astype(jnp.float32),
        "err_pos_meter": jnp.sum(jnp.linalg.norm(err_pose[..., :2], axis=-1)),
        "err_rot_deg": jnp.sum(jnp.abs(jnp.degrees(cast_rad(err_pose[..., 2])))),
        "err_spd_m_per_s": jnp.sum(jnp.abs(err_motion[..., 0])),
    }


def compute_error_metrics(sums: Dict[str, jnp.ndarray], prefix: str) -> Dict[str, float]:
    c = max(float(sums["err_counter"]), 1e-8)
    return {
        f"{prefix}/err/pos_meter": float(sums["err_pos_meter"]) / c,
        f"{prefix}/err/rot_deg": float(sums["err_rot_deg"]) / c,
        f"{prefix}/err/spd_m_per_s": float(sums["err_spd_m_per_s"]) / c,
    }


def traffic_rule_sums(buffer: RolloutBuffer, ag_type: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Violation rates numerators/denominators (logging.py:79-107).
    buffer flattened: leaves [n_sc, K, n_ag, n_step]."""
    valid = buffer.pred_valid
    invalid = ~valid

    def acc(name):
        v = jnp.where(invalid, False, buffer.violation[name])
        return jnp.sum(jnp.any(v, axis=-1)).astype(jnp.float32)

    valid_any = jnp.any(valid, axis=-1)  # [n_sc, K, n_ag]
    mask_veh = ag_type[:, None, :, 0]
    return {
        "counter_agent": jnp.sum(valid_any).astype(jnp.float32),
        "counter_veh": jnp.sum(valid_any & mask_veh).astype(jnp.float32),
        "outside_map": acc("outside_map"),
        "collided": acc("collided"),
        "run_road_edge": acc("run_road_edge"),
        "run_red_light": acc("run_red_light"),
        "passive": acc("passive"),
        "goal_reached": acc("goal_reached"),
        "dest_reached": acc("dest_reached"),
    }


def compute_traffic_rule_metrics(sums: Dict[str, jnp.ndarray], prefix: str) -> Dict[str, float]:
    ca = max(float(sums["counter_agent"]), 1e-8)
    cv = max(float(sums["counter_veh"]), 1e-8)
    return {
        f"{prefix}/traffic_rule/outside_map": float(sums["outside_map"]) / ca,
        f"{prefix}/traffic_rule/collided": float(sums["collided"]) / ca,
        f"{prefix}/traffic_rule/run_road_edge": float(sums["run_road_edge"]) / cv,
        f"{prefix}/traffic_rule/run_red_light": float(sums["run_red_light"]) / cv,
        f"{prefix}/traffic_rule/passive": float(sums["passive"]) / cv,
        f"{prefix}/traffic_rule/goal_reached": float(sums["goal_reached"]) / ca,
        f"{prefix}/traffic_rule/dest_reached": float(sums["dest_reached"]) / ca,
    }


def merge_sums(a: Dict[str, jnp.ndarray], b: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    if not a:
        return dict(b)
    return {k: a[k] + b[k] for k in a}
