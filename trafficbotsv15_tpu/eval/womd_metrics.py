"""WOMD motion-prediction metrics.

Parity target: /root/reference/src/models/metrics/womd.py, which packs
predictions into Waymo's official C++ `py_metrics_ops.motion_metrics`
(womd.py:140-149). This module provides both:

  - `pack_waymo_inputs`: the same input packing (pred-role agents first, 8
    joint slots, 7-dim GT trajectories) so the official op can be called
    unchanged when waymo_open_dataset is installed (`official_motion_metrics`),
  - a native JAX implementation of minADE / minFDE / miss-rate (per Waymo's
    published thresholds) so validation works without the TF dependency.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

# Waymo miss-rate thresholds at 3s/5s/8s (lateral, longitudinal) for speed
# scaling, following the challenge definition.
_MISS_THRESH_LAT = {3: 1.0, 5: 1.8, 8: 3.0}
_MISS_THRESH_LON = {3: 2.0, 5: 3.6, 8: 6.0}


def pack_waymo_inputs(
    batch: Dict[str, np.ndarray],
    trajs: np.ndarray,  # [n_sc, n_ag, K, n_step_2hz, 3]
    scores: np.ndarray,  # [n_sc, n_ag, K]
    step_gt: int,
    step_current: int,
    m_joint: int = 8,
) -> Dict[str, np.ndarray]:
    """Reorder into the official op's layout (womd.py:48-112): predict-role
    agents first, then other fully-observed agents; 8 joint slots, n_pred=1."""
    mask_pred = np.asarray(batch["agent/role"][..., 2], bool)
    mask_other = (~mask_pred) & np.asarray(batch["agent/valid"][:, :, : step_current + 1]).all(-1)

    pos = np.asarray(batch["agent/pos"])
    gt_traj = np.concatenate(
        [
            pos[..., :2],
            np.broadcast_to(np.asarray(batch["agent/size"])[:, :, None, :2], pos[..., :2].shape),
            np.asarray(batch["agent/yaw_bbox"]),
            np.asarray(batch["agent/vel"]),
        ],
        axis=-1,
    )[:, :, : step_gt + 1]
    gt_valid = np.asarray(batch["agent/valid"])[:, :, : step_gt + 1]
    agent_type = np.asarray(batch["agent/type"]).argmax(-1) + 1.0

    n_sc, n_ag, n_step_gt = gt_valid.shape
    n_k, n_step_pred = trajs.shape[2], trajs.shape[3]
    out = {
        "prediction_trajectory": np.zeros([n_sc, m_joint, n_k, 1, n_step_pred, 2], np.float32),
        "prediction_score": np.zeros([n_sc, m_joint, n_k], np.float32),
        "ground_truth_trajectory": np.zeros([n_sc, n_ag, n_step_gt, 7], np.float32),
        "ground_truth_is_valid": np.zeros([n_sc, n_ag, n_step_gt], bool),
        "prediction_ground_truth_indices_mask": np.zeros([n_sc, m_joint, 1], bool),
        "object_type": np.zeros([n_sc, n_ag], np.float32),
    }
    for i in range(n_sc):
        np_pred = int(mask_pred[i].sum())
        np_other = int(mask_other[i].sum())
        out["prediction_trajectory"][i, :np_pred] = trajs[i, mask_pred[i], :, None, :, :2]
        out["prediction_score"][i, :np_pred] = scores[i, mask_pred[i]]
        out["prediction_ground_truth_indices_mask"][i, :np_pred] = True
        out["ground_truth_trajectory"][i, :np_pred] = gt_traj[i, mask_pred[i]]
        out["ground_truth_is_valid"][i, :np_pred] = gt_valid[i, mask_pred[i]]
        out["ground_truth_trajectory"][i, np_pred : np_pred + np_other] = gt_traj[i, mask_other[i]]
        out["ground_truth_is_valid"][i, np_pred : np_pred + np_other] = gt_valid[i, mask_other[i]]
        out["object_type"][i, :np_pred] = agent_type[i, mask_pred[i]]
        out["object_type"][i, np_pred : np_pred + np_other] = agent_type[i, mask_other[i]]
    return out


def official_motion_metrics(packed: Dict[str, np.ndarray], step_current: int, prefix: str):
    """Call Waymo's C++/TF motion metrics op (womd.py:114-174). Requires
    waymo_open_dataset + tensorflow; raises ImportError otherwise."""
    import tensorflow as tf
    from google.protobuf import text_format
    from waymo_open_dataset.metrics.ops import py_metrics_ops
    from waymo_open_dataset.metrics.python.config_util_py import get_breakdown_names_from_motion_config
    from waymo_open_dataset.protos import motion_metrics_pb2

    config = motion_metrics_pb2.MotionMetricsConfig()
    text_format.Parse(
        f"""
        track_steps_per_second: 10
        prediction_steps_per_second: 2
        track_history_samples: {step_current}
        track_future_samples: 80
        speed_lower_bound: 1.4
        speed_upper_bound: 11.0
        speed_scale_lower: 0.5
        speed_scale_upper: 1.0
        step_configurations {{ measurement_step: 5 lateral_miss_threshold: 1.0 longitudinal_miss_threshold: 2.0 }}
        step_configurations {{ measurement_step: 9 lateral_miss_threshold: 1.8 longitudinal_miss_threshold: 3.6 }}
        step_configurations {{ measurement_step: 15 lateral_miss_threshold: 3.0 longitudinal_miss_threshold: 6.0 }}
        max_predictions: 6
        """,
        config,
    )
    metrics = py_metrics_ops.motion_metrics(
        config=config.SerializeToString(),
        prediction_trajectory=tf.convert_to_tensor(packed["prediction_trajectory"]),
        prediction_score=tf.convert_to_tensor(packed["prediction_score"]),
        ground_truth_trajectory=tf.convert_to_tensor(packed["ground_truth_trajectory"]),
        ground_truth_is_valid=tf.convert_to_tensor(packed["ground_truth_is_valid"]),
        prediction_ground_truth_indices=tf.zeros(
            packed["prediction_ground_truth_indices_mask"].shape, tf.int64),
        prediction_ground_truth_indices_mask=tf.convert_to_tensor(
            packed["prediction_ground_truth_indices_mask"]),
        object_type=tf.convert_to_tensor(packed["object_type"]),
    )
    names = get_breakdown_names_from_motion_config(config)
    out = {}
    for metric_type in ("min_ade", "min_fde", "miss_rate", "overlap_rate", "mean_average_precision"):
        values = np.asarray(getattr(metrics, metric_type))
        for i, n in enumerate(names):
            out[f"{prefix}/waymo_metrics/{metric_type}_{n}"] = float(values[i])
        out[f"{prefix}/waymo_metrics/{metric_type}"] = float(values.mean())
    return out


def native_motion_metrics(
    trajs: jnp.ndarray,  # [n_sc, n_ag, K, n_step_2hz, >=2], 2 Hz predictions
    scores: jnp.ndarray,  # [n_sc, n_ag, K]
    gt_pos: jnp.ndarray,  # [n_sc, n_ag, n_step_gt, 2] at 10 Hz, absolute steps 0..
    gt_yaw: jnp.ndarray,  # [n_sc, n_ag, n_step_gt]
    gt_valid: jnp.ndarray,  # [n_sc, n_ag, n_step_gt]
    gt_spd: jnp.ndarray,  # [n_sc, n_ag, n_step_gt]
    mask_pred: jnp.ndarray,  # [n_sc, n_ag] evaluate these agents
    step_current: int = 10,
) -> Dict[str, jnp.ndarray]:
    """Native minADE/minFDE/miss-rate at 3/5/8 s over 2 Hz samples.

    Follows the WOMD definitions: predictions at steps current+5k (k=1..16);
    miss thresholds scale with initial speed in [0.5, 1] over [1.4, 11] m/s,
    displacement decomposed into lateral/longitudinal wrt the GT heading.
    """
    n_step_pred = trajs.shape[3]
    if n_step_pred == 0:  # degenerate short-horizon config: nothing to measure
        return {}
    # GT downsampled to the same 2 Hz grid
    steps = step_current + 5 * (jnp.arange(n_step_pred) + 1)
    gt_pos_2hz = gt_pos[:, :, steps]
    gt_yaw_2hz = gt_yaw[:, :, steps]
    gt_valid_2hz = gt_valid[:, :, steps]

    d = trajs[..., :2] - gt_pos_2hz[:, :, None]  # [n_sc, n_ag, K, n_step, 2]
    dist = jnp.linalg.norm(d, axis=-1)
    dist = jnp.where(gt_valid_2hz[:, :, None], dist, 0.0)
    cnt = jnp.maximum(jnp.sum(gt_valid_2hz, axis=-1), 1)[:, :, None]

    out = {}
    # speed-scaled miss thresholds
    v0 = gt_spd[:, :, step_current]
    scale = 0.5 + 0.5 * jnp.clip((v0 - 1.4) / (11.0 - 1.4), 0.0, 1.0)

    valid_ag = mask_pred & jnp.any(gt_valid_2hz, -1)
    n_valid = jnp.maximum(jnp.sum(valid_ag), 1)

    horizons = [(h, m) for h, m in ((3, 5), (5, 9), (8, 15)) if m < n_step_pred]
    if not horizons:  # short-horizon configs: measure at the last sample
        horizons = [(max((n_step_pred * 5) // 10, 1), n_step_pred - 1)]
    for horizon_s, meas in horizons:
        upto = meas + 1
        v2 = gt_valid_2hz[:, :, :upto]
        c2 = jnp.maximum(jnp.sum(v2, -1), 1)[:, :, None]
        min_ade = jnp.min(jnp.sum(dist[..., :upto], -1) / c2, axis=-1)  # [n_sc, n_ag]
        has_final = gt_valid_2hz[:, :, meas]
        min_fde = jnp.min(dist[..., meas], axis=-1)

        # miss: displacement at measurement step decomposed in GT heading frame
        yaw = gt_yaw_2hz[:, :, meas]
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        dx = d[:, :, :, meas, 0] * c[:, :, None] + d[:, :, :, meas, 1] * s[:, :, None]
        dy = -d[:, :, :, meas, 0] * s[:, :, None] + d[:, :, :, meas, 1] * c[:, :, None]
        lat_t = _MISS_THRESH_LAT.get(horizon_s, 1.0) * scale
        lon_t = _MISS_THRESH_LON.get(horizon_s, 2.0) * scale
        hit = (jnp.abs(dy) <= lat_t[:, :, None]) & (jnp.abs(dx) <= lon_t[:, :, None])
        miss = ~jnp.any(hit, axis=-1)  # [n_sc, n_ag] missed by all K

        m_ag = valid_ag & has_final
        n_m = jnp.maximum(jnp.sum(m_ag), 1)
        out[f"min_ade_{horizon_s}s"] = jnp.sum(jnp.where(valid_ag, min_ade, 0.0)) / n_valid
        out[f"min_fde_{horizon_s}s"] = jnp.sum(jnp.where(m_ag, min_fde, 0.0)) / n_m
        out[f"miss_rate_{horizon_s}s"] = jnp.sum(jnp.where(m_ag, miss, False)) / n_m

    out["min_ade"] = jnp.mean(jnp.stack([out[k] for k in out if k.startswith("min_ade_")]))
    out["min_fde"] = jnp.mean(jnp.stack([out[k] for k in out if k.startswith("min_fde_")]))
    out["miss_rate"] = jnp.mean(jnp.stack([out[k] for k in out if k.startswith("miss_rate_")]))
    return out
