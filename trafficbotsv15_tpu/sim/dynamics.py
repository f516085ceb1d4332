"""Agent dynamics: action bounding + state integration as pure functions.

Parity target: /root/reference/src/utils/dynamics.py. The MultiPathPP
integrator (tanh-bounded acc/yaw_rate, midpoint integration) is vectorized
over the three agent types with per-type bounds gathered via the type one-hot
— no python loop over 3 dynamics objects.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from trafficbotsv15_tpu.config import DynamicsCfg
from trafficbotsv15_tpu.ops.transform import cast_rad


def process_action_multipathpp(action: jnp.ndarray, ag_type: jnp.ndarray, cfg: DynamicsCfg) -> jnp.ndarray:
    """Unbounded action -> (acc m/s^2, yaw_rate rad/s), tanh-bounded per type.

    action: [n_sc, n_ag, 2]; ag_type one-hot [n_sc, n_ag, 3] (veh, ped, cyc).
    """
    t = jnp.tanh(action)
    types = ag_type.astype(action.dtype)
    if cfg.use_veh_dynamics_for_all:
        max_acc = cfg.max_acc[0]
        max_yr = cfg.max_yaw_rate[0]
    else:
        max_acc = types @ jnp.asarray(cfg.max_acc, action.dtype)
        max_yr = types @ jnp.asarray(cfg.max_yaw_rate, action.dtype)
    return jnp.stack([t[..., 0] * max_acc, t[..., 1] * max_yr], axis=-1)


def update_multipathpp(
    pose: jnp.ndarray, motion: jnp.ndarray, action: jnp.ndarray, dt: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Midpoint integration (dynamics.py:248-274).

    pose: [n_sc, n_ag, 3] (x, y, yaw); motion: [n_sc, n_ag, 3] (spd, acc, yaw_rate);
    action: [n_sc, n_ag, 2] (acc, yaw_rate).
    """
    acc, yaw_rate = action[..., 0], action[..., 1]
    v_tilde = motion[..., 0] + 0.5 * dt * acc
    theta_tilde = pose[..., 2] + 0.5 * dt * yaw_rate
    delta = jnp.stack([v_tilde * jnp.cos(theta_tilde), v_tilde * jnp.sin(theta_tilde), yaw_rate], axis=-1)
    pred_pose = pose + dt * delta
    spd = motion[..., 0] + dt * acc
    pred_motion = jnp.stack([spd, acc, yaw_rate], axis=-1)
    return pred_pose, pred_motion


def process_action_integrator(action: jnp.ndarray, max_v: float = 3.0) -> jnp.ndarray:
    """StateIntegrator variant (dynamics.py:277-290): tanh-bounded (vx, vy)."""
    return jnp.tanh(action) * max_v


def update_integrator(
    pose: jnp.ndarray, motion: jnp.ndarray, action: jnp.ndarray, dt: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """vx/vy integrator (dynamics.py:292-318)."""
    vx, vy = action[..., 0], action[..., 1]
    theta = jnp.arctan2(vy, vx)
    pred_pose = jnp.stack([pose[..., 0] + vx * dt, pose[..., 1] + vy * dt, theta], axis=-1)
    spd = jnp.linalg.norm(action, axis=-1)
    acc = (spd - motion[..., 0]) / dt
    yaw_rate = cast_rad(theta - pose[..., 2]) / dt
    return pred_pose, jnp.stack([spd, acc, yaw_rate], axis=-1)


def step_dynamics(
    pose: jnp.ndarray,  # [n_sc, n_ag, 3]
    motion: jnp.ndarray,  # [n_sc, n_ag, 3]
    valid: jnp.ndarray,  # [n_sc, n_ag] bool
    action_unbounded: jnp.ndarray,  # [n_sc, n_ag, 2]
    ag_type: jnp.ndarray,  # [n_sc, n_ag, 3] one-hot
    cfg: DynamicsCfg,
    player_override: Optional[Dict[str, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One dynamics update (dynamics.py:66-120).

    Returns (new_pose, new_motion, bounded_action); invalid agents frozen at 0.
    """
    action = process_action_multipathpp(action_unbounded, ag_type, cfg)
    invalid = ~valid[..., None]
    action = jnp.where(invalid, 0.0, action)
    if player_override is not None:
        m = (player_override["valid"] & valid)[..., None]
        action = jnp.where(m, player_override["action"], action)
    new_pose, new_motion = update_multipathpp(pose, motion, action, cfg.dt)
    new_pose = jnp.where(invalid, 0.0, new_pose)
    new_motion = jnp.where(invalid, 0.0, new_motion)
    return new_pose, new_motion, action


def override_ag(
    valid: jnp.ndarray,
    pose: jnp.ndarray,
    motion: jnp.ndarray,
    disabled: jnp.ndarray,
    ov_valid: jnp.ndarray,
    ov_pose: jnp.ndarray,
    ov_motion: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Teacher forcing / spawn override (dynamics.py:122-141)."""
    ov = ov_valid & ~disabled
    new_valid = valid | ov
    ovx = ov[..., None]
    return new_valid, jnp.where(ovx, ov_pose, pose), jnp.where(ovx, ov_motion, motion)


def disable_outside_map(
    valid: jnp.ndarray,  # [n_sc, n_ag] post-override validity
    disabled: jnp.ndarray,  # [n_sc, n_ag] sticky disable accumulator
    outside_map_this_step: jnp.ndarray,  # [n_sc, n_ag]
    gt_valid: jnp.ndarray,  # [n_sc, n_ag] GT-valid agents are never disabled
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Disable agents that left the map unless GT-valid (dynamics.py:165-181).

    Returns (new_valid, new_disabled). Disabled agents cannot be re-spawned:
    `override_ag` masks its override validity with ~disabled.
    """
    disable = outside_map_this_step & ~gt_valid
    return valid & ~disable, disabled | disable


def update_navi_on_reached(
    navi: jnp.ndarray,  # dest [n_sc, n_ag] | goal/cmd [n_sc, n_ag, d]
    navi_valid: jnp.ndarray,  # [n_sc, n_ag]
    reached: jnp.ndarray,  # [n_sc, n_ag] *_reached_this_step
    new_navi: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Navi bookkeeping once reached (dynamics.py:183-222).

    `disable_navi`: the reached navi is invalidated. If the model re-predicted
    a replacement (`new_navi`, from pred_navi_after_reached), `override_navi`
    installs it for the reached agents and re-validates them.
    """
    navi_valid = navi_valid & ~reached
    if new_navi is not None:
        m = reached if navi.ndim == 2 else reached[..., None]
        navi = jnp.where(m, new_navi.astype(navi.dtype), navi)
        navi_valid = navi_valid | reached
    return navi, navi_valid


def override_tl(
    tl_logits: jnp.ndarray,  # [n_sc, n_tl, n_state] predicted logits
    ov_valid: jnp.ndarray,  # [n_sc, n_tl]
    ov_state: jnp.ndarray,  # [n_sc, n_tl, n_state] bool one-hot
) -> jnp.ndarray:
    """Next tl_state = argmax(pred) overridden by GT where available
    (dynamics.py:143-163). Returns bool one-hot [n_sc, n_tl, n_state]."""
    n_state = tl_logits.shape[-1]
    pred = jnp.argmax(tl_logits, axis=-1)
    one_hot = jnp.arange(n_state)[None, None, :] == pred[..., None]
    return jnp.where(ov_valid[..., None], ov_state.astype(bool), one_hot)
