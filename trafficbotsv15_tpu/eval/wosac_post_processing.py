"""WOSAC post-processing: select best 32 futures, transform to global frame,
build ScenarioRollouts protos.

Parity target: /root/reference/src/data_modules/wosac_post_processing.py.
Device part (future filtering + global-frame transform) is jnp; proto assembly
is host-side and only runs when the waymo_open_dataset package is available
(gated import, same protos and constant-velocity z extrapolation).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from trafficbotsv15_tpu.config import WOSACPostCfg
from trafficbotsv15_tpu.ops.transform import pos2global, rad2global, rad2rot
from trafficbotsv15_tpu.sim.rollout import RolloutBuffer

N_JOINT_FUTURE_WOSAC = 32  # fixed by the challenge


def filter_futures(
    cfg: WOSACPostCfg,
    buffer: RolloutBuffer,  # flattened: [n_sc, K, n_ag, n_step, ...]
    ag_role: jnp.ndarray,  # [n_sc, n_ag, 3]
    step_future_start: int,
) -> jnp.ndarray:
    """Keep the 32 futures with fewest violations (wosac_post_processing.py:31-64).
    Returns trajs [n_sc, 32, n_ag, n_step_future, 3]."""
    trajs = buffer.pred_pose[:, :, :, step_future_start:]
    k = trajs.shape[1]
    if k <= N_JOINT_FUTURE_WOSAC:
        return trajs
    role = jnp.any(ag_role, axis=-1).astype(jnp.float32)[:, None]  # [n_sc, 1, n_ag]
    key = "collided_wosac" if cfg.use_wosac_col else "collided"
    collided = jnp.any(buffer.violation[key][..., step_future_start:], axis=-1)
    road_edge = jnp.any(buffer.violation["run_road_edge"][..., step_future_start:], axis=-1)
    violation = jnp.sum(collided * role, -1) + cfg.w_road_edge * jnp.sum(road_edge * role, -1)
    import jax

    _, idx = jax.lax.top_k(-violation, N_JOINT_FUTURE_WOSAC)
    return jnp.take_along_axis(trajs, idx[:, :, None, None, None], axis=1)


def to_global_frame(
    trajs: jnp.ndarray,  # [n_sc, K, n_ag, n_step, 3] scene-centric
    scenario_center: jnp.ndarray,  # [n_sc, 2]
    scenario_yaw: jnp.ndarray,  # [n_sc]
) -> jnp.ndarray:
    """Scene-centric -> global WOMD frame (wosac_post_processing.py:69-79)."""
    n_sc = trajs.shape[0]
    rot = rad2rot(scenario_yaw)
    pos = trajs[..., :2].reshape(n_sc, -1, 2)
    pos = pos2global(pos, scenario_center[:, None, :], rot).reshape(trajs.shape[:-1] + (2,))
    yaw = rad2global(trajs[..., 2].reshape(n_sc, -1), scenario_yaw).reshape(trajs.shape[:-1])
    return jnp.concatenate([pos, yaw[..., None]], axis=-1)


def build_wosac_data(
    cfg: WOSACPostCfg,
    buffer: RolloutBuffer,
    ag_role: jnp.ndarray,
    batch: Dict[str, jnp.ndarray],
    step_current: int,
    scenario_center: Optional[jnp.ndarray] = None,
    scenario_yaw: Optional[jnp.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Device part: filtered futures in global frame + metadata arrays."""
    trajs = filter_futures(cfg, buffer, ag_role, step_current)
    if scenario_center is not None:
        trajs = to_global_frame(trajs, scenario_center, scenario_yaw)
    out = {"trajs": np.asarray(trajs)}
    for k in ("history/agent/valid", "history/agent/pos", "history/agent/yaw_bbox",
              "history/agent/object_id", "history/agent_no_sim/valid", "history/agent_no_sim/pos",
              "history/agent_no_sim/yaw_bbox", "history/agent_no_sim/object_id"):
        if k in batch:
            out[k] = np.asarray(batch[k])
    return out


def get_scenario_rollouts(
    cfg: WOSACPostCfg,
    wosac_data: Dict[str, np.ndarray],
    step_current: int,
    step_gt: int,
    scenario_ids: List[str],
    scenario_center: Optional[np.ndarray] = None,
    scenario_yaw: Optional[np.ndarray] = None,
):
    """Host-side proto assembly (wosac_post_processing.py:103-202).
    Requires waymo_open_dataset; raises ImportError otherwise."""
    from waymo_open_dataset.protos import sim_agents_submission_pb2 as pb

    trajs = wosac_data["trajs"]
    n_sc, n_future = trajs.shape[:2]
    t_step = np.arange(step_gt - step_current) + 1

    def global_np(pos, yaw, i):
        if scenario_center is None:
            return pos, yaw
        c, s = np.cos(scenario_yaw[i]), np.sin(scenario_yaw[i])
        rot_t = np.array([[c, s], [-s, c]])  # transpose of rot
        return pos @ rot_t + scenario_center[i], yaw + scenario_yaw[i]

    rollouts = []
    for i in range(n_sc):
        # no-sim agents: constant velocity extrapolation from history
        no_sim = []
        valid_ns = wosac_data["history/agent_no_sim/valid"][i]
        pos_ns = wosac_data["history/agent_no_sim/pos"][i]
        yaw_ns = wosac_data["history/agent_no_sim/yaw_bbox"][i]
        oid_ns = wosac_data["history/agent_no_sim/object_id"][i]
        for a in np.where(valid_ns[:, step_current])[0]:
            if cfg.const_vel_no_sim and valid_ns[a, step_current - 1]:
                v = pos_ns[a, step_current] - pos_ns[a, step_current - 1]
            else:
                v = np.zeros(3)
            xy = pos_ns[a, step_current, :2] + v[None, :2] * t_step[:, None]
            yaw = np.full(len(t_step), yaw_ns[a, step_current, 0])
            xy, yaw = global_np(xy, yaw, i)
            no_sim.append(pb.SimulatedTrajectory(
                center_x=xy[:, 0], center_y=xy[:, 1],
                center_z=pos_ns[a, step_current, 2] + v[2] * t_step,
                heading=yaw, object_id=int(oid_ns[a]),
            ))

        valid_s = wosac_data["history/agent/valid"][i]
        pos_s = wosac_data["history/agent/pos"][i]
        oid_s = wosac_data["history/agent/object_id"][i]
        joint_scenes = []
        for r in range(n_future):
            sim = []
            for a in np.where(valid_s[:, step_current])[0]:
                if cfg.const_vel_z_sim and valid_s[a, step_current - 1]:
                    v_z = pos_s[a, step_current, 2] - pos_s[a, step_current - 1, 2]
                else:
                    v_z = 0.0
                sim.append(pb.SimulatedTrajectory(
                    center_x=trajs[i, r, a, :, 0], center_y=trajs[i, r, a, :, 1],
                    center_z=pos_s[a, step_current, 2] + v_z * t_step,
                    heading=trajs[i, r, a, :, 2], object_id=int(oid_s[a]),
                ))
            joint_scenes.append(pb.JointScene(simulated_trajectories=sim + no_sim))
        rollouts.append(pb.ScenarioRollouts(joint_scenes=joint_scenes, scenario_id=scenario_ids[i]))
    return rollouts
