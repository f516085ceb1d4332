"""Scene-centric pre-processing: h5 batch dict -> model inputs.

Parity target: /root/reference/src/data_modules/scene_centric.py. Pure
function of (batch, key, cfg flags): builds sc/* inputs, gt/* targets and
ref/* metadata, merges invalid traffic-light steps into state UNKNOWN, and
applies history dropout augmentation with an explicit PRNG key.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PreProcessedBatch:
    """Model-ready tensors. All bools use True = valid."""

    # map
    mp_valid: jnp.ndarray  # [n_sc, n_mp, n_node]
    mp_attr: jnp.ndarray  # [n_sc, n_mp, n_mp_type] float
    mp_pose: jnp.ndarray  # [n_sc, n_mp, n_node, 3]
    mp_type: jnp.ndarray  # [n_sc, n_mp, n_mp_type] bool
    # traffic lights (history window for the encoder)
    tl_valid: jnp.ndarray  # [n_sc, n_tl]
    tl_attr: Optional[jnp.ndarray]  # [n_sc, n_tl] int lane idx (lane mode) or None
    tl_state: jnp.ndarray  # [n_sc, n_tl, n_step_hist, 5]
    tl_pose: jnp.ndarray  # [n_sc, n_tl, 3]
    # agents (history)
    ag_valid: jnp.ndarray  # [n_sc, n_ag, n_step_hist]
    ag_attr: jnp.ndarray  # [n_sc, n_ag, 6] (size ++ type)
    ag_motion: jnp.ndarray  # [n_sc, n_ag, n_step_hist, 3]
    ag_pose: jnp.ndarray  # [n_sc, n_ag, n_step_hist, 3]
    # ground truth (None at test time)
    gt_valid: Optional[jnp.ndarray]  # [n_sc, n_ag, n_step]
    gt_motion: Optional[jnp.ndarray]
    gt_pose: Optional[jnp.ndarray]
    gt_navi: Optional[jnp.ndarray]  # cmd [n_sc, n_ag, 8] / goal [.., 4] / dest [n_sc, n_ag]
    gt_tl_valid: Optional[jnp.ndarray]  # [n_sc, n_tl]
    gt_tl_state: Optional[jnp.ndarray]  # [n_sc, n_tl, n_step, 5]
    # reference info
    ag_type: jnp.ndarray  # [n_sc, n_ag, 3] bool
    ag_role: jnp.ndarray  # [n_sc, n_ag, 3] bool
    ag_size: jnp.ndarray  # [n_sc, n_ag, 3]


jax.tree_util.register_dataclass(
    PreProcessedBatch,
    data_fields=[f.name for f in dataclasses.fields(PreProcessedBatch)],
    meta_fields=[],
)


def merge_invalid_tl_into_state(tl_valid: jnp.ndarray, tl_state: jnp.ndarray):
    """Invalid tl steps become state UNKNOWN=0 (scene_centric.py:149-165).

    tl_valid: [n_sc, n_tl, n_step]; tl_state one-hot [n_sc, n_tl, n_step, 5].
    Returns (tl_valid_any [n_sc, n_tl], merged state).
    """
    tl_valid_any = jnp.any(tl_valid, axis=-1)
    invalid_steps = (~tl_valid) & tl_valid_any[..., None]
    unknown = jnp.zeros_like(tl_state).at[..., 0].set(invalid_steps)
    return tl_valid_any, tl_state | unknown.astype(tl_state.dtype)


def pre_processing(
    batch: Dict[str, jnp.ndarray],
    tl_mode: str = "lane",
    navi_mode: str = "dest",
    n_step_hist: int = 11,
    dropout_p_history: float = -1.0,
    training: bool = True,
    key: Optional[jax.Array] = None,
) -> PreProcessedBatch:
    """batch keys follow the h5 schema (data_h5_womd.py:102-134); at val/test
    time history tensors may be under the 'history/' prefix."""
    prefix = "" if (training or "agent/valid" in batch) else "history/"

    mp_pose = jnp.concatenate(
        [batch["map/pos"][..., :2], jnp.arctan2(batch["map/dir"][..., 1:2], batch["map/dir"][..., 0:1])], axis=-1
    )
    mp_valid = batch["map/valid"]

    tlk = f"tl_{tl_mode}"
    tl_valid_steps = batch[f"{prefix}{tlk}/valid"][:, :, :n_step_hist]
    tl_state = batch[f"{prefix}{tlk}/state"][:, :, :n_step_hist]
    tl_valid, tl_state = merge_invalid_tl_into_state(tl_valid_steps, tl_state)

    if tl_mode == "stop":
        tl_attr = None
        tl_pose = jnp.concatenate(
            [
                batch[f"{prefix}tl_stop/pos"][..., :2],
                jnp.arctan2(batch[f"{prefix}tl_stop/dir"][..., 1:2], batch[f"{prefix}tl_stop/dir"][..., 0:1]),
            ],
            axis=-1,
        )
    else:
        tl_attr = batch[f"{prefix}tl_lane/idx"]
        idx = jnp.clip(tl_attr, 0, mp_pose.shape[1] - 1).astype(jnp.int32)
        tl_pose = jnp.take_along_axis(mp_pose[:, :, 0], idx[..., None], axis=1)

    ag_valid = batch[f"{prefix}agent/valid"][:, :, :n_step_hist]
    ag_attr = jnp.concatenate(
        [batch[f"{prefix}agent/size"], batch[f"{prefix}agent/type"].astype(batch[f"{prefix}agent/size"].dtype)],
        axis=-1,
    )
    ag_motion = jnp.concatenate(
        [
            batch[f"{prefix}agent/spd"][:, :, :n_step_hist],
            batch[f"{prefix}agent/acc"][:, :, :n_step_hist],
            batch[f"{prefix}agent/yaw_rate"][:, :, :n_step_hist],
        ],
        axis=-1,
    )
    ag_pose = jnp.concatenate(
        [batch[f"{prefix}agent/pos"][:, :, :n_step_hist, :2], batch[f"{prefix}agent/yaw_bbox"][:, :, :n_step_hist]],
        axis=-1,
    )

    gt_valid = gt_motion = gt_pose = gt_navi = gt_tl_valid = gt_tl_state = None
    if "agent/valid" in batch:
        gt_valid = batch["agent/valid"]
        gt_motion = jnp.concatenate([batch["agent/spd"], batch["agent/acc"], batch["agent/yaw_rate"]], axis=-1)
        gt_pose = jnp.concatenate([batch["agent/pos"][..., :2], batch["agent/yaw_bbox"]], axis=-1)
        if navi_mode != "dummy":
            gt_navi = batch[f"agent/{navi_mode}"]
        gt_tl_valid, gt_tl_state = merge_invalid_tl_into_state(batch[f"{tlk}/valid"], batch[f"{tlk}/state"])

    # history dropout augmentation (scene_centric.py:138-145)
    if training and 0 < dropout_p_history <= 1.0 and key is not None:
        k1, k2 = jax.random.split(key)
        keep_mp = jax.random.bernoulli(k1, 1.0 - dropout_p_history, mp_valid[:, :, 1:].shape)
        mp_valid = mp_valid.at[:, :, 1:].set(mp_valid[:, :, 1:] & keep_mp)
        keep_ag = jax.random.bernoulli(k2, 1.0 - dropout_p_history, ag_valid[..., :-1].shape)
        ag_valid = ag_valid.at[..., :-1].set(ag_valid[..., :-1] & keep_ag)

    return PreProcessedBatch(
        mp_valid=mp_valid,
        mp_attr=batch["map/type"].astype(jnp.float32),
        mp_pose=mp_pose,
        mp_type=batch["map/type"].astype(bool),
        tl_valid=tl_valid,
        tl_attr=tl_attr,
        tl_state=tl_state,
        tl_pose=tl_pose,
        ag_valid=ag_valid,
        ag_attr=ag_attr,
        ag_motion=ag_motion,
        ag_pose=ag_pose,
        gt_valid=gt_valid,
        gt_motion=gt_motion,
        gt_pose=gt_pose,
        gt_navi=gt_navi,
        gt_tl_valid=gt_tl_valid,
        gt_tl_state=gt_tl_state,
        ag_type=batch[f"{prefix}agent/type"].astype(bool),
        ag_role=batch[f"{prefix}agent/role"].astype(bool),
        ag_size=batch[f"{prefix}agent/size"],
    )
