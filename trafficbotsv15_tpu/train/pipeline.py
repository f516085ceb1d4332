"""End-to-end training/eval pipeline functions.

Parity target: /root/reference/src/pl_modules/waymo_motion.py
(training_step:313-385, reactive_replay:387-437, joint_future_pred:439-524).
Each phase is a pure function of (params, batch, key); `make_train_step`
builds the jitted gradient step.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from trafficbotsv15_tpu.config import ExperimentCfg
from trafficbotsv15_tpu.data.preprocessing import pre_processing
from trafficbotsv15_tpu.models.traffic_bots import TrafficBots
from trafficbotsv15_tpu.sim import rollout as rollout_lib
from trafficbotsv15_tpu.sim import tl_prepass
from trafficbotsv15_tpu.sim.rule_checker import init_rule_checker
from trafficbotsv15_tpu.sim.teacher_forcing import build_forcing_masks
from trafficbotsv15_tpu.train.losses import training_loss


def build_model(cfg: ExperimentCfg, dtype=None) -> TrafficBots:
    """Compute dtype follows cfg.precision (bf16 matmuls, fp32 params/heads)."""
    if dtype is None:
        dtype = jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32
    navi_dim = {"cmd": cfg.data.n_ag_cmd, "goal": 4}.get(cfg.model.navi_mode)
    return TrafficBots(cfg=cfg.model, time_step_gt=cfg.time_step_gt, navi_dim=navi_dim, dtype=dtype)


def init_params(cfg: ExperimentCfg, model: TrafficBots, batch: Dict[str, jnp.ndarray], key: jax.Array):
    """Initialize all parameters by tracing every phase once.

    The init graph (every encoder + the step) is large; on the TPU backend its
    one-off compile costs minutes through the remote compiler, so when a CPU
    backend is available we trace init there and device_put the params after
    (run with JAX_PLATFORMS=axon,cpu / tpu,cpu to enable)."""
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None and jax.default_backend() != "cpu":
        small = jax.tree_util.tree_map(lambda x: jax.device_put(x, cpu), batch)
        with jax.default_device(cpu):
            params = _init_params_traced(cfg, model, small, key)
        return jax.device_put(params, jax.devices()[0])
    return _init_params_traced(cfg, model, batch, key)


def _init_params_traced(cfg: ExperimentCfg, model: TrafficBots, batch: Dict[str, jnp.ndarray], key: jax.Array):
    pp = pre_processing(
        batch, tl_mode=cfg.model.tl_mode, navi_mode=cfg.model.navi_mode,
        n_step_hist=cfg.n_step_hist, dropout_p_history=-1.0, training=True,
    )
    W = max(cfg.model.temp_window_size, 1)
    n_sc, n_ag = pp.ag_valid.shape[:2]
    latent_dim = max(cfg.model.latent_encoder.latent_dim, 1)

    def init_fn(m: TrafficBots):
        mp_tokens = m.encode_map(pp.mp_valid, pp.mp_attr, pp.mp_pose, pp.mp_type)
        tl_tokens = m.precompute_tl(pp.tl_valid, pp.tl_attr, pp.tl_pose, mp_tokens)
        m.encode_latent(pp.gt_valid, pp.ag_attr, pp.gt_motion, pp.gt_pose, pp.ag_type,
                        pp.gt_tl_state.astype(jnp.float32), mp_tokens, tl_tokens, posterior=True)
        m.encode_latent(pp.ag_valid, pp.ag_attr, pp.ag_motion, pp.ag_pose, pp.ag_type,
                        pp.tl_state.astype(jnp.float32), mp_tokens, tl_tokens, posterior=False)
        m.predict_navi(pp.ag_valid, pp.ag_attr, pp.ag_motion, pp.ag_pose, pp.ag_type, mp_tokens)
        m.step(
            ag_valid=pp.ag_valid[:, :, -1],
            hist_ag_valid=pp.ag_valid[:, :, -W:],
            hist_ag_pose=pp.ag_pose[:, :, -W:],
            hist_ag_motion=pp.ag_motion[:, :, -W:],
            hist_tl_state=pp.tl_state[:, :, -W:].astype(jnp.float32),
            hist_step_invalid=jnp.zeros(W, bool),
            ag_attr=pp.ag_attr,
            ag_type=pp.ag_type,
            ag_latent=jnp.zeros((n_sc, n_ag, latent_dim)),
            ag_latent_valid=jnp.any(pp.ag_valid, -1),
            ag_navi=pp.gt_navi,
            ag_navi_valid=jnp.any(pp.gt_valid, -1),
            tl_tokens=tl_tokens,
            mp_tokens=mp_tokens,
        )
        return None

    return model.init({"params": key, "dropout": key}, method=init_fn)["params"]


def _select_latent(key, post, prior, p_prior: float):
    """Sample latent; with prob p_prior use the prior (waymo_motion.py:348-350)."""
    if post is None:
        return None, None
    k_sel, k_sample = jax.random.split(key)
    use_prior = jax.random.bernoulli(k_sel, p_prior)
    sample_post = post.sample(k_sample, False)
    sample_prior = prior.sample(k_sample, False)
    latent = jnp.where(use_prior, sample_prior, sample_post)
    valid = jnp.where(use_prior, prior.valid, post.valid)
    return latent, valid


def training_forward(
    cfg: ExperimentCfg,
    model: TrafficBots,
    params,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    current_epoch: int = 0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One full training forward: preproc -> encoders -> CVAE -> rollout -> loss."""
    k_pre, k_latent, k_tf, k_roll, k_drop, k_loss = jax.random.split(key, 6)
    # fold_in instead of widening the split: keeps every pre-existing derived
    # key identical to the pre-tl_prepass recipe, so fixed-seed runs with
    # tl_prepass=False reproduce earlier rounds bit-for-bit (ADVICE r4 #4)
    k_tlpre = jax.random.fold_in(key, 7)

    pp = pre_processing(
        batch, tl_mode=cfg.model.tl_mode, navi_mode=cfg.model.navi_mode,
        n_step_hist=cfg.n_step_hist, dropout_p_history=cfg.dropout_p_history,
        training=True, key=k_pre,
    )
    rngs = {"dropout": k_drop}
    apply = functools.partial(model.apply, {"params": params}, rngs=rngs)

    with jax.named_scope("encode_scene"):
        mp_tokens = apply(pp.mp_valid, pp.mp_attr, pp.mp_pose, pp.mp_type,
                          deterministic=False, method="encode_map")
        tl_tokens = apply(pp.tl_valid, pp.tl_attr, pp.tl_pose, mp_tokens, method="precompute_tl")

    latent_post = apply(pp.gt_valid, pp.ag_attr, pp.gt_motion, pp.gt_pose, pp.ag_type,
                        pp.gt_tl_state.astype(jnp.float32), mp_tokens, tl_tokens, True,
                        deterministic=False, method="encode_latent")
    latent_prior = apply(pp.ag_valid, pp.ag_attr, pp.ag_motion, pp.ag_pose, pp.ag_type,
                         pp.tl_state.astype(jnp.float32), mp_tokens, tl_tokens, False,
                         deterministic=False, method="encode_latent")
    ag_latent, ag_latent_valid = _select_latent(k_latent, latent_post, latent_prior,
                                                cfg.p_training_rollout_prior)

    navi_pred = apply(pp.ag_valid, pp.ag_attr, pp.ag_motion, pp.ag_pose, pp.ag_type, mp_tokens,
                      deterministic=False, method="predict_navi")

    # rule checker (training: disable_check -> level 0) + teacher forcing
    rule_statics, rule_state0 = init_rule_checker(
        mp_boundary=batch["map/boundary"], mp_valid=batch["map/valid"], mp_type=batch["map/type"].astype(bool),
        mp_pos=batch["map/pos"], mp_dir=batch["map/dir"], ag_type=pp.ag_type, ag_size=pp.ag_size,
        tl_valid=tl_tokens.valid, tl_pose=tl_tokens.pose,
        ag_goal=batch.get("agent/goal"), ag_dest=batch.get("agent/dest"),
    )
    tl_forcing0 = jnp.ones(pp.gt_tl_state.shape[:3], bool)  # TL always forced to GT when available
    ag_forcing, tl_forcing = build_forcing_masks(
        cfg.teacher_forcing_training, pp.gt_valid, tl_forcing0, current_epoch, k_tf
    )

    # TL fully forced over the GT horizon -> one batched TL encode outside the
    # remat'd scan: the 90 tiny in-scan TL launches (and their BPTT replay)
    # become one matmul stack whose activations are stored once
    tl_pre = None
    if (cfg.tl_prepass and cfg.model.temp_window_size > 0
            and pp.gt_tl_state.shape[2] >= cfg.time_step_end + 1
            and tl_prepass.fully_forced(tl_forcing, tl_forcing0)):
        with jax.named_scope("tl_prepass"):
            tl_pre = tl_prepass.tl_rollout_forced(
                model, params, tl_tokens, pp.gt_tl_state.astype(jnp.float32),
                cfg.time_step_end, cfg.model.temp_window_size,
                deterministic=False, key=k_tlpre,
            )

    with jax.named_scope("rollout_scan"):
        buffer = rollout_lib.rollout(
            model, params, cfg, mp_tokens, tl_tokens,
            ag_attr=pp.ag_attr, ag_type=pp.ag_type, ag_size=pp.ag_size,
            ag_latent=ag_latent, ag_latent_valid=ag_latent_valid,
            ag_navi=pp.gt_navi, ag_navi_valid=jnp.any(pp.gt_valid, -1),
            ag_navi_log_prob=jnp.zeros_like(pp.ag_attr[:, :, 0]),
            gt_valid=pp.gt_valid, gt_pose=pp.gt_pose, gt_motion=pp.gt_motion,
            gt_tl_state=pp.gt_tl_state.astype(jnp.float32),
            ag_forcing=ag_forcing, tl_forcing=tl_forcing,
            rule_statics=rule_statics, rule_state0=rule_state0, check_level=0,
            key=k_roll, deterministic_action=cfg.training_deterministic_action, train=True,
            navi_update_inputs=_navi_update_inputs(cfg, batch),
            tl_precomputed=tl_pre,
        )

    loss, metrics = training_loss(
        cfg.training_metrics, buffer, pp.ag_role, navi_pred, pp.gt_navi,
        latent_post, latent_prior, key=k_loss,
    )
    return loss, metrics


def _navi_update_inputs(cfg: ExperimentCfg, batch, rep=None):
    """Map arrays for in-scan navi re-prediction (None unless enabled)."""
    if not cfg.pred_navi_after_reached:
        return None
    r = rep if rep is not None else (lambda x: x)
    return dict(
        mp_valid=r(batch["map/valid"]), mp_type=r(batch["map/type"]).astype(bool),
        mp_pos=r(batch["map/pos"]), mp_dir=r(batch["map/dir"]),
    )


def make_train_step(cfg: ExperimentCfg, model: TrafficBots, optimizer):
    """Build the (donated, jit-able) gradient step."""

    def train_step(params, opt_state, batch, key, epoch):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: training_forward(cfg, model, p, batch, key, epoch), has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree_util.tree_leaves(grads)))
        metrics["grad_norm"] = gnorm
        return params, opt_state, metrics

    return train_step
