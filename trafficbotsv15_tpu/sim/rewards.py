"""Differentiable per-step imitation reward.

Parity target: /root/reference/src/utils/rewards.py (DifferentiableReward):
-SmoothL1(pos) * 0.1, -0.5(1-cos) angular * 10, -SmoothL1(spd) * 0.1, masked
by pred∧gt validity; optional 5-circle soft collision penalty.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from trafficbotsv15_tpu.config import RewardCfg


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def angular_error(pred: jnp.ndarray, target: jnp.ndarray, angular_type: str) -> jnp.ndarray:
    """metrics/loss.py:9-36."""
    from trafficbotsv15_tpu.ops.transform import cast_rad

    if angular_type == "cosine":
        return 0.5 * (1.0 - jnp.cos(pred - target))
    if angular_type == "cast":
        return smooth_l1(cast_rad(pred - target), jnp.zeros_like(pred))
    if angular_type == "vector":
        return smooth_l1(jnp.cos(pred), jnp.cos(target)) + smooth_l1(jnp.sin(pred), jnp.sin(target))
    return smooth_l1(pred, target)


def soft_collision_5circle(
    pred_valid: jnp.ndarray,  # [n_sc, n_ag]
    pred_pose: jnp.ndarray,  # [n_sc, n_ag, 3]
    ag_size: jnp.ndarray,  # [n_sc, n_ag, 3]
    reduce_with_max: bool,
) -> jnp.ndarray:
    """Relaxed 5-circle pairwise collision in [0, 1] (rewards.py:87-154)."""
    n_sc, n_ag = pred_valid.shape
    eps = jnp.finfo(pred_pose.dtype).eps
    xy = pred_pose[..., :2]
    yaw = pred_pose[..., 2]
    heading = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)
    w = jnp.min(ag_size[..., :2], axis=-1)
    l = jnp.max(ag_size[..., :2], axis=-1)
    d = ((l - w) / 4.0)[..., None]
    offsets = jnp.asarray([-2.0, -1.0, 0.0, 1.0, 2.0])
    centroids = xy[:, :, None, :] + offsets[None, None, :, None] * heading[:, :, None, :] * d[:, :, None, :]
    # pairwise min distance over 5x5 circle pairs
    diff = centroids[:, :, None, :, None, :] - centroids[:, None, :, None, :, :]
    dist = jnp.linalg.norm(diff, axis=-1) + eps  # [n_sc, n_ag, n_ag, 5, 5]
    dist = jnp.min(dist.reshape(n_sc, n_ag, n_ag, 25), axis=-1)
    r = w / 2.0 + eps
    r_sum = r[:, :, None] + r[:, None, :]
    collision = jnp.clip(1.0 - dist / r_sum, 0.0, None)
    invalid = ~pred_valid
    ego = jnp.eye(n_ag, dtype=bool)[None]
    mask = ego | invalid[:, :, None] | invalid[:, None, :]
    collision = jnp.where(mask, 0.0, collision)
    if reduce_with_max:
        return jnp.max(collision, axis=2)
    collision = jnp.clip(collision, None, 1.0)
    return jnp.sum(collision, axis=-1) / jnp.sum(pred_valid, axis=-1, keepdims=True)


def diffbar_reward(
    cfg: RewardCfg,
    pred_valid: jnp.ndarray,  # [n_sc, n_ag]
    pred_pose: jnp.ndarray,  # [n_sc, n_ag, 3]
    pred_motion: jnp.ndarray,  # [n_sc, n_ag, 3]
    gt_valid: Optional[jnp.ndarray],
    gt_pose: Optional[jnp.ndarray],
    gt_motion: Optional[jnp.ndarray],
    ag_size: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Per-step rewards (rewards.py:35-85). Keys match the reference buffer."""
    zeros = jnp.zeros_like(pred_pose[..., 0])
    out = {
        "diffbar_reward_valid": pred_valid,
        "diffbar_reward": zeros,
        "r_imitation_pos": zeros,
        "r_imitation_rot": zeros,
        "r_imitation_spd": zeros,
        "r_traffic_rule_approx": zeros,
    }
    if cfg.use_il_loss and gt_valid is not None:
        valid = pred_valid & gt_valid
        out["diffbar_reward_valid"] = valid
        e_pos = jnp.sum(smooth_l1(gt_pose[..., :2], pred_pose[..., :2]), axis=-1)
        e_rot = angular_error(gt_pose[..., 2], pred_pose[..., 2], cfg.angular_type)
        e_spd = smooth_l1(gt_motion[..., 0], pred_motion[..., 0])
        inv = ~valid
        out["r_imitation_pos"] = jnp.where(inv, 0.0, -cfg.w_pos * e_pos)
        out["r_imitation_rot"] = jnp.where(inv, 0.0, -cfg.w_rot * e_rot)
        out["r_imitation_spd"] = jnp.where(inv, 0.0, -cfg.w_spd * e_spd)
        out["diffbar_reward"] = out["r_imitation_pos"] + out["r_imitation_rot"] + out["r_imitation_spd"]
    if cfg.w_collision > 0:
        out["diffbar_reward_valid"] = pred_valid
        col = soft_collision_5circle(pred_valid, pred_pose, ag_size, cfg.reduce_collision_with_max)
        col = jnp.where(~pred_valid, 0.0, -cfg.w_collision * col)
        out["r_traffic_rule_approx"] = col
        out["diffbar_reward"] = out["diffbar_reward"] + col
    return out
