"""Training loss assembly.

Parity target: /root/reference/src/models/metrics/training.py (TrainingMetrics
update/compute) — balanced CVAE KL with free nats, diffbar reward (subtracted),
navigation NLL, traffic-light-state NLL, with the reference's loss masking:
start at step_training_start, optional relevant-agent weighting, optional
exclusion of teacher-forced steps. Implemented as a pure function returning
(scalar loss, metrics dict); under pjit the jnp.sum reductions aggregate over
the sharded batch axis automatically (the torchmetrics dist_reduce_fx="sum"
equivalent).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from trafficbotsv15_tpu.config import TrainingMetricsCfg
from trafficbotsv15_tpu.ops.distributions import balanced_kl
from trafficbotsv15_tpu.sim.rollout import RolloutBuffer

_EPS = 1e-8


def training_loss(
    cfg: TrainingMetricsCfg,
    buffer: RolloutBuffer,  # un-flattened: leaves [n_sc, n_ag/n_tl, n_step, ...]
    ag_role: jnp.ndarray,  # [n_sc, n_ag, 3]
    navi_pred,  # MyDist or None
    navi_gt: Optional[jnp.ndarray],
    latent_post,  # MyDist or None
    latent_prior,
    key: Optional[jax.Array] = None,
    prefix: str = "training",
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    loss_valid = jax.lax.stop_gradient(buffer.pred_valid)  # [n_sc, n_ag, n_step]
    n_step = loss_valid.shape[2]

    if cfg.p_loss_for_irrelevant < 1.0:
        relevant = jnp.any(ag_role, axis=-1, keepdims=True)  # [n_sc, n_ag, 1]
        if cfg.p_loss_for_irrelevant > 0.0 and key is not None:
            relevant = relevant | jax.random.bernoulli(key, cfg.p_loss_for_irrelevant, relevant.shape)
        loss_valid = loss_valid & relevant
    if cfg.step_training_start > 0:
        # buffer step axis starts at absolute step 1
        step_abs = jnp.arange(1, n_step + 1)
        loss_valid = loss_valid & (step_abs >= cfg.step_training_start)[None, None, :]
    if not cfg.loss_for_teacher_forcing:
        loss_valid = loss_valid & ~buffer.mask_teacher_forcing

    w_rel = None
    if cfg.w_relevant_agent > 0:
        w_rel = jnp.any(loss_valid, -1).astype(jnp.float32) + jnp.any(ag_role, -1) * cfg.w_relevant_agent

    out: Dict[str, jnp.ndarray] = {}
    loss = jnp.zeros(())

    # CVAE balanced KL
    if latent_post is not None and cfg.w_vae_kl > 0:
        kl_valid = latent_post.valid if cfg.kl_for_unseen_agent else latent_prior.valid
        kl_valid = kl_valid & jnp.any(loss_valid, axis=-1)
        err = balanced_kl(latent_post, latent_prior, cfg.kl_balance_scale, cfg.kl_free_nats)
        if w_rel is not None:
            err = err * w_rel
        kl_sum = jnp.sum(jnp.where(kl_valid, err, 0.0))
        kl_cnt = jnp.sum(kl_valid)
        out[f"{prefix}/vae_kl"] = cfg.w_vae_kl * kl_sum / (kl_cnt + _EPS)
        loss = loss + out[f"{prefix}/vae_kl"]

    # diffbar reward (subtracted)
    if cfg.w_diffbar_reward > 0:
        r_valid = loss_valid & buffer.diffbar_reward["diffbar_reward_valid"]
        r = jnp.where(r_valid, buffer.diffbar_reward["diffbar_reward"], 0.0)
        if w_rel is not None:
            r = r * w_rel[..., None]
        if cfg.temporal_discount > 0:
            tf = buffer.mask_teacher_forcing.astype(jnp.float32)

            def disc_step(prev, tf_t):
                cur = tf_t + (1.0 - tf_t) * prev * cfg.temporal_discount
                return cur, cur

            tf_steps = jnp.moveaxis(tf, 2, 0)
            _, discs = jax.lax.scan(disc_step, jnp.ones_like(tf[:, :, 0]), tf_steps)
            r = r * jnp.moveaxis(discs, 0, 2)
        cnt = jnp.sum(r_valid)
        out[f"{prefix}/diffbar_reward"] = cfg.w_diffbar_reward * jnp.sum(r) / (cnt + _EPS)
        for k in ("r_imitation_pos", "r_imitation_rot", "r_imitation_spd", "r_traffic_rule_approx"):
            out[f"{prefix}/dr_{k}"] = jnp.sum(buffer.diffbar_reward[k]) / (cnt + _EPS)
        loss = loss - out[f"{prefix}/diffbar_reward"]

    # navigation NLL
    if navi_pred is not None and cfg.w_navi > 0:
        from trafficbotsv15_tpu.ops.distributions import DestCategorical

        navi_valid = navi_pred.valid & jnp.any(loss_valid, axis=-1)
        if isinstance(navi_pred, DestCategorical) and navi_gt.ndim == navi_pred.logits.ndim:
            navi_gt = jnp.argmax(navi_gt, axis=-1)  # cmd mode: one-hot -> class index
        nll = -navi_pred.log_prob(navi_gt)
        nll = jnp.where(navi_valid, nll, 0.0)
        if w_rel is not None:
            nll = nll * w_rel
        out[f"{prefix}/navi_loss"] = cfg.w_navi * jnp.sum(nll) / (jnp.sum(navi_valid) + _EPS)
        loss = loss + out[f"{prefix}/navi_loss"]

    # traffic light state NLL
    if cfg.w_tl_state > 0:
        tl_valid = ~buffer.tl_state_nll_invalid
        nll = jnp.where(tl_valid, buffer.tl_state_nll, 0.0)
        out[f"{prefix}/tl_state_loss"] = cfg.w_tl_state * jnp.sum(nll) / (jnp.sum(tl_valid) + _EPS)
        loss = loss + out[f"{prefix}/tl_state_loss"]

    out[f"{prefix}/loss"] = loss
    return loss, out
