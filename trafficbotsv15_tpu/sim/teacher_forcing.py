"""Teacher forcing mask precomputation.

Parity target: /root/reference/src/utils/teacher_forcing.py. The full
[n_sc, n_ag, n_step] forcing mask is built once before the rollout scan (the
reference already precomputes in init); per-step overrides become indexed
slices of the scan inputs. Error-threshold resets (threshold_xy/yaw/spd > 0)
are applied inside the scan step since they depend on the live prediction.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from trafficbotsv15_tpu.config import TeacherForcingCfg
from trafficbotsv15_tpu.ops.transform import cast_rad


def build_forcing_masks(
    cfg: TeacherForcingCfg,
    ag_valid: jnp.ndarray,  # [n_sc, n_ag, n_step] GT validity
    tl_valid_step: jnp.ndarray,  # [n_sc, n_tl, n_step] per-step tl GT availability (all True in ref)
    current_epoch: int,
    key: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (ag_teacher_forcing [n_sc, n_ag, n_step], tl_teacher_forcing [n_sc, n_tl, n_step])."""
    n_sc, n_ag, n_step = ag_valid.shape
    forcing = jnp.zeros_like(ag_valid)

    # always spawn at step 0
    forcing = forcing.at[:, :, 0].set(ag_valid[:, :, 0])

    # spawn on rising edge of validity up to step_spawn_agent (tracks are interpolated)
    if cfg.step_spawn_agent > 0:
        spawn = (~ag_valid[:, :, :-1]) & ag_valid[:, :, 1:]
        step_idx = jnp.arange(1, n_step)[None, None, :]
        spawn = spawn & (step_idx <= cfg.step_spawn_agent)
        forcing = forcing.at[:, :, 1:].set(forcing[:, :, 1:] | spawn)

    # warm start: force all valid agents up to step_warm_start
    if cfg.step_warm_start >= 0:
        upto = min(cfg.step_warm_start + 1, n_step)
        forcing = forcing.at[:, :, :upto].set(forcing[:, :, :upto] | ag_valid[:, :, :upto])

    # epoch-decayed horizon (traceable in current_epoch)
    step_horizon = cfg.step_horizon - cfg.step_horizon_decrease_per_epoch * current_epoch
    step_idx_full = jnp.arange(n_step)[None, None, :]
    forcing = forcing | (ag_valid & (step_idx_full < step_horizon))

    # per-agent forcing probability (epoch-decayed)
    k1, k2 = jax.random.split(key)
    p_agent = cfg.prob_forcing_agent - cfg.prob_forcing_agent_decrease_per_epoch * current_epoch
    if cfg.prob_forcing_agent > 0:
        mask = jax.random.bernoulli(k1, jnp.clip(p_agent, 0.0, 1.0), (n_sc, n_ag)) & (p_agent > 0)
        forcing = forcing | (mask[..., None] & ag_valid)

    # scheduled sampling
    p_ss = cfg.prob_scheduled_sampling - cfg.prob_scheduled_sampling_decrease_per_epoch * current_epoch
    if cfg.prob_scheduled_sampling > 0:
        mask = jax.random.bernoulli(k2, jnp.clip(p_ss, 0.0, 1.0), (n_sc, n_ag, n_step)) & (p_ss > 0)
        forcing = forcing | (mask & ag_valid)

    # what-if motion prediction: SDC (agent 0) always forced
    if cfg.gt_sdc:
        forcing = forcing.at[:, 0].set(forcing[:, 0] | ag_valid[:, 0])

    return forcing, tl_valid_step


def error_reset_mask(
    cfg: TeacherForcingCfg,
    pred_valid: jnp.ndarray,  # [n_sc, n_ag]
    pred_pose: jnp.ndarray,  # [n_sc, n_ag, 3]
    pred_motion: jnp.ndarray,  # [n_sc, n_ag, 3]
    gt_valid_prev: jnp.ndarray,  # [n_sc, n_ag] GT validity at step-1
    gt_pose_prev: jnp.ndarray,
    gt_motion_prev: jnp.ndarray,
) -> jnp.ndarray:
    """Threshold-based reset (teacher_forcing.py:131-145). Returns extra forcing mask."""
    out = jnp.zeros_like(pred_valid)
    if cfg.threshold_xy <= 0 and cfg.threshold_yaw <= 0 and cfg.threshold_spd <= 0:
        return out
    err_valid = pred_valid & gt_valid_prev
    err_pose = jnp.where(err_valid[..., None], pred_pose - gt_pose_prev, 0.0)
    if cfg.threshold_xy > 0:
        out = out | (jnp.linalg.norm(err_pose[..., :2], axis=-1) > cfg.threshold_xy)
    if cfg.threshold_yaw > 0:
        deg = jnp.abs(jnp.degrees(cast_rad(err_pose[..., 2])))
        out = out | (deg > cfg.threshold_yaw)
    if cfg.threshold_spd > 0:
        err_spd = jnp.abs(jnp.where(err_valid, pred_motion[..., 0] - gt_motion_prev[..., 0], 0.0))
        out = out | (err_spd > cfg.threshold_spd)
    return out
