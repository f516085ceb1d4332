"""WOMD motion-prediction post-processing: K joint futures -> 6 marginal modes.

Parity target: /root/reference/src/data_modules/womd_post_processing.py.
Device-side (jnp) implementations of topk / MTR-NMS / MPA-NMS with static
k_pred loops; k-means EM aggregation (aggr_thresh, off in the flagship config)
runs host-side in numpy because of its data-dependent empty-cluster splits.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from trafficbotsv15_tpu.config import WOMDPostCfg


def _within_dist(xy: jnp.ndarray, thresh: jnp.ndarray, use_ade: bool) -> jnp.ndarray:
    """xy: [n_sc, n_ag, K, n_step, 2] -> bool [n_sc, n_ag, K, K]."""
    if use_ade:
        d = jnp.linalg.norm(xy[:, :, None] - xy[:, :, :, None], axis=-1).mean(-1)
    else:
        last = xy[:, :, :, -1]
        d = jnp.linalg.norm(last[:, :, None] - last[:, :, :, None], axis=-1)
    return d < thresh


def _type_thresh(ag_type: jnp.ndarray, type_thresh) -> jnp.ndarray:
    thresh = jnp.zeros(ag_type.shape[:2])
    for i, t in enumerate(type_thresh):
        thresh = thresh + ag_type[:, :, i] * t
    return thresh[:, :, None, None]


def traj_topk(trajs: jnp.ndarray, scores: jnp.ndarray, k_pred: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """trajs [n_sc, n_ag, K, n_step, 3], scores [n_sc, n_ag, K] -> top k_pred."""
    _, idx = jax.lax.top_k(scores, k_pred)
    trajs_k = jnp.take_along_axis(trajs, idx[:, :, :, None, None], axis=2)
    scores_k = jnp.take_along_axis(scores, idx, axis=2)
    return trajs_k, scores_k / jnp.sum(scores_k, -1, keepdims=True)


def mtr_nms(
    trajs: jnp.ndarray, scores: jnp.ndarray, k_pred: int, type_thresh, use_ade: bool, ag_type: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS selection of k_pred modes (womd_post_processing.py:107-155).

    `scores` must be non-negative (softmaxed): the 0.01 suppression factor is
    multiplicative, so a negative (e.g. raw-logit) score would be *promoted*
    by suppression. Selected modes are excluded with a -inf mask rather than
    the reference's `- 2.0` offset so the exclusion holds for any score scale.
    """
    thresh = _type_thresh(ag_type, type_thresh)
    within = _within_dist(trajs[..., :2], thresh, use_ade)
    s = scores
    idxs = []
    for _ in range(k_pred):
        idx = jnp.argmax(s, axis=-1)  # [n_sc, n_ag]
        sel_within = jnp.take_along_axis(within, idx[:, :, None, None], axis=2)[:, :, 0]
        w = jnp.where(sel_within, 0.01, 1.0)
        s = s * w
        s = jnp.where(jax.nn.one_hot(idx, s.shape[-1], dtype=bool), -jnp.inf, s)  # mark selected
        idxs.append(idx)
    idx = jnp.stack(idxs, axis=-1)  # [n_sc, n_ag, k_pred]
    trajs_k = jnp.take_along_axis(trajs, idx[:, :, :, None, None], axis=2)
    scores_k = jnp.take_along_axis(scores, idx, axis=2)
    return trajs_k, scores_k / jnp.sum(scores_k, -1, keepdims=True)


def mpa_nms(trajs: jnp.ndarray, scores: jnp.ndarray, type_thresh, use_ade: bool, ag_type: jnp.ndarray) -> jnp.ndarray:
    """Score suppression: a mode within thresh of a higher-scoring mode gets
    score 1e-3, processed in descending score order so that suppressed modes
    no longer suppress others (womd_post_processing.py:73-105)."""
    thresh = _type_thresh(ag_type, type_thresh)
    within = _within_dist(trajs[..., :2], thresh, use_ade)
    order = jnp.argsort(-scores, axis=-1)  # [n_sc, n_ag, K]
    k = scores.shape[-1]

    def body(r, s):
        idx = order[:, :, r]  # [n_sc, n_ag]
        row_within = jnp.take_along_axis(within, idx[:, :, None, None], axis=2)[:, :, 0]  # [n_sc, n_ag, K]
        s_idx = jnp.take_along_axis(s, idx[:, :, None], axis=2)  # [n_sc, n_ag, 1]
        suppressed = jnp.any(row_within & (s > s_idx), axis=-1)  # [n_sc, n_ag]
        new_val = jnp.where(suppressed[..., None], 1e-3, s_idx)
        one = jax.nn.one_hot(idx, k, dtype=s.dtype)
        return s * (1 - one) + one * new_val

    s = jax.lax.fori_loop(0, k, body, scores)
    return s / jnp.sum(s, -1, keepdims=True)


def traj_aggr_np(
    trajs: np.ndarray, scores: np.ndarray, k_pred: int, thresh, n_iter_em: int, use_ade: bool
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side k-means EM aggregation with empty-cluster splitting
    (womd_post_processing.py:178-278).

    thresh[0] (scalar) intentionally: the reference's traj_aggr signature is
    `thresh: float` and never consults ag_type — unlike mtr/mpa NMS, the
    aggregation threshold is not per-agent-type."""
    n_sc, n_ag, n_k = scores.shape
    xy = trajs[..., :2]
    if use_ade:
        within = np.linalg.norm(xy[:, :, None] - xy[:, :, :, None], axis=-1).mean(-1) < thresh[0]
    else:
        last = xy[:, :, :, -1]
        within = np.linalg.norm(last[:, :, None] - last[:, :, :, None], axis=-1) < thresh[0]
    s = scores.copy()
    idxs = []
    for _ in range(k_pred):
        idx = s.argmax(-1)
        sel = np.take_along_axis(within, idx[:, :, None, None], axis=2)[:, :, 0]
        s = s * np.where(sel, 0.1, 1.0)
        np.put_along_axis(s, idx[:, :, None], np.take_along_axis(s, idx[:, :, None], 2) - 1.0, 2)
        idxs.append(idx)
    idx = np.stack(idxs, -1)
    trajs_k = np.take_along_axis(trajs, idx[:, :, :, None, None], axis=2)
    scores_k = np.take_along_axis(scores, idx, axis=2)

    for _ in range(n_iter_em):
        xy_k = trajs_k[..., :2]
        if use_ade:
            dist = np.linalg.norm(xy_k[:, :, None] - xy[:, :, :, None], axis=-1).mean(-1)
        else:
            dist = np.linalg.norm(xy_k[:, :, :, -1][:, :, None] - xy[:, :, :, -1][:, :, :, None], axis=-1)
        assign = np.eye(k_pred, dtype=np.int64)[dist.argmin(-1)]  # [n_sc, n_ag, n_k, k_pred]
        empty = np.argwhere(assign.sum(2) == 0)
        for (i, j, p) in empty:
            counts = assign[i, j].sum(0)
            big = counts.argmax()
            members = np.where(assign[i, j, :, big] == 1)[0][: counts[big] // 2]
            assign[i, j, members, big] = 0
            assign[i, j, members, p] = 1
        n_members = np.maximum(assign.sum(2), 1)
        trajs_k = (trajs[:, :, :, None] * assign[:, :, :, :, None, None]).sum(2) / n_members[:, :, :, None, None]
        scores_k = (scores[:, :, :, None] * assign).sum(2) / n_members
    return trajs_k, scores_k / scores_k.sum(-1, keepdims=True)


def womd_post_process(
    cfg: WOMDPostCfg,
    ag_type: jnp.ndarray,  # [n_sc, n_ag, 3]
    trajs: jnp.ndarray,  # [n_sc, K, n_ag, n_step_future, 3]
    scores: Optional[jnp.ndarray] = None,  # [n_sc, K, n_ag] log probs
    track_future_samples: int = 80,
) -> Dict[str, jnp.ndarray]:
    """Returns {"trajs": [n_sc, n_ag, k_pred, 16, 3] (2 Hz), "scores": [n_sc, n_ag, k_pred]}."""
    trajs = jnp.swapaxes(trajs, 1, 2)  # [n_sc, n_ag, K, n_step, 3]
    if scores is None:
        scores = jnp.zeros(trajs.shape[:3])
    else:
        scores = jnp.swapaxes(scores, 1, 2)
    scores = jax.nn.softmax(scores, axis=-1)

    if trajs.shape[2] > cfg.k_pred:
        if len(cfg.aggr_thresh) > 0:
            # host-side EM via pure_callback: every caller of womd_post_process
            # runs under jax.jit (runner.py step functions), so np.asarray on
            # the traced arrays would fail at trace time. Output shapes are
            # static (k_pred modes), so the callback is jit-compatible.
            def _aggr_host(t, s):
                tk, sk = traj_aggr_np(
                    np.asarray(t), np.asarray(s), cfg.k_pred, cfg.aggr_thresh,
                    cfg.n_iter_em, cfg.use_ade,
                )
                return tk.astype(t.dtype), sk.astype(s.dtype)

            out_shape = (
                jax.ShapeDtypeStruct(trajs.shape[:2] + (cfg.k_pred,) + trajs.shape[3:], trajs.dtype),
                jax.ShapeDtypeStruct(scores.shape[:2] + (cfg.k_pred,), scores.dtype),
            )
            trajs, scores = jax.pure_callback(_aggr_host, out_shape, trajs, scores)
        elif len(cfg.mtr_nms_thresh) > 0:
            trajs, scores = mtr_nms(trajs, scores, cfg.k_pred, cfg.mtr_nms_thresh, cfg.use_ade, ag_type)
        else:
            trajs, scores = traj_topk(trajs, scores, cfg.k_pred)

    if len(cfg.mpa_nms_thresh) > 0:
        scores = mpa_nms(trajs, scores, cfg.mpa_nms_thresh, cfg.use_ade, ag_type)
    if cfg.score_temperature > 0:
        scores = jax.nn.softmax(jnp.log(scores) / cfg.score_temperature, axis=-1)

    # downsample 10 Hz -> 2 Hz (womd_post_processing.py:71)
    return {"trajs": trajs[:, :, :, 4:track_future_samples:5], "scores": scores}
