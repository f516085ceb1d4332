"""Evaluation pipelines: reactive replay and joint-future prediction.

Parity target: /root/reference/src/pl_modules/waymo_motion.py
(reactive_replay:387-437, joint_future_pred:439-524, validation_step:526-671).
The WOSAC x32 / x128 future replication (`repeat_interleave` in the
reference) is a jnp.repeat along the scenario axis so the replicas shard over
the data-parallel mesh with everything else.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from trafficbotsv15_tpu.config import ExperimentCfg
from trafficbotsv15_tpu.data.preprocessing import PreProcessedBatch, pre_processing
from trafficbotsv15_tpu.models.traffic_bots import TrafficBots
from trafficbotsv15_tpu.sim import rollout as rollout_lib
from trafficbotsv15_tpu.sim import tl_prepass
from trafficbotsv15_tpu.sim.rule_checker import init_rule_checker
from trafficbotsv15_tpu.train.pipeline import _navi_update_inputs
from trafficbotsv15_tpu.sim.teacher_forcing import build_forcing_masks


def _repeat(x, k):
    return None if x is None else jnp.repeat(x, k, axis=0)


def encode_scene(cfg: ExperimentCfg, model: TrafficBots, params, pp: PreProcessedBatch):
    mp_tokens = model.apply({"params": params}, pp.mp_valid, pp.mp_attr, pp.mp_pose, pp.mp_type,
                            method="encode_map")
    tl_tokens = model.apply({"params": params}, pp.tl_valid, pp.tl_attr, pp.tl_pose, mp_tokens,
                            method="precompute_tl")
    return mp_tokens, tl_tokens


def reactive_replay(
    cfg: ExperimentCfg,
    model: TrafficBots,
    params,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    check_level: int = 1,
):
    """Posterior-latent GT-navi reconstruction rollout (waymo_motion.py:387-437,
    validation flavor: deterministic latent/action, spawn-all forcing)."""
    k_tf, k_roll, k_lat = jax.random.split(key, 3)
    pp = pre_processing(batch, tl_mode=cfg.model.tl_mode, navi_mode=cfg.model.navi_mode,
                        n_step_hist=cfg.n_step_hist, training=True)
    mp_tokens, tl_tokens = encode_scene(cfg, model, params, pp)

    latent_post = model.apply({"params": params}, pp.gt_valid, pp.ag_attr, pp.gt_motion, pp.gt_pose,
                              pp.ag_type, pp.gt_tl_state.astype(jnp.float32), mp_tokens, tl_tokens, True,
                              method="encode_latent")
    latent_prior = model.apply({"params": params}, pp.ag_valid, pp.ag_attr, pp.ag_motion, pp.ag_pose,
                               pp.ag_type, pp.tl_state.astype(jnp.float32), mp_tokens, tl_tokens, False,
                               method="encode_latent")
    ag_latent = None if latent_post is None else latent_post.sample(k_lat, True)
    ag_latent_valid = None if latent_post is None else latent_post.valid

    navi_pred = model.apply({"params": params}, pp.ag_valid, pp.ag_attr, pp.ag_motion, pp.ag_pose,
                            pp.ag_type, mp_tokens, method="predict_navi")

    statics, state0 = init_rule_checker(
        mp_boundary=batch["map/boundary"], mp_valid=batch["map/valid"],
        mp_type=batch["map/type"].astype(bool), mp_pos=batch["map/pos"], mp_dir=batch["map/dir"],
        ag_type=pp.ag_type, ag_size=pp.ag_size, tl_valid=tl_tokens.valid, tl_pose=tl_tokens.pose,
        ag_goal=batch.get("agent/goal"), ag_dest=batch.get("agent/dest"),
    )
    tl_forcing0 = jnp.ones(pp.gt_tl_state.shape[:3], bool)
    ag_forcing, tl_forcing = build_forcing_masks(
        cfg.teacher_forcing_reactive_replay, pp.gt_valid, tl_forcing0, 0, k_tf
    )
    # TL fully forced to GT over the whole horizon -> one batched TL encode
    # replaces 90 per-step launches inside the scan (sim/tl_prepass.py)
    tl_pre = None
    if (cfg.tl_prepass and cfg.model.temp_window_size > 0
            and pp.gt_tl_state.shape[2] >= cfg.time_step_end + 1
            and tl_prepass.fully_forced(tl_forcing, tl_forcing0)):
        tl_pre = tl_prepass.tl_rollout_forced(
            model, params, tl_tokens, pp.gt_tl_state.astype(jnp.float32),
            cfg.time_step_end, cfg.model.temp_window_size, deterministic=True,
        )
    buffer = rollout_lib.rollout(
        model, params, cfg, mp_tokens, tl_tokens,
        ag_attr=pp.ag_attr, ag_type=pp.ag_type, ag_size=pp.ag_size,
        ag_latent=ag_latent, ag_latent_valid=ag_latent_valid,
        ag_navi=pp.gt_navi, ag_navi_valid=jnp.any(pp.gt_valid, -1),
        ag_navi_log_prob=jnp.zeros_like(pp.ag_attr[:, :, 0]),
        gt_valid=pp.gt_valid, gt_pose=pp.gt_pose, gt_motion=pp.gt_motion,
        gt_tl_state=pp.gt_tl_state.astype(jnp.float32),
        ag_forcing=ag_forcing, tl_forcing=tl_forcing,
        rule_statics=statics, rule_state0=state0, check_level=check_level,
        key=k_roll, deterministic_action=True, train=False,
        navi_update_inputs=_navi_update_inputs(cfg, batch),
        tf_cfg=cfg.teacher_forcing_reactive_replay,
        tl_precomputed=tl_pre,
    )
    return pp, buffer, navi_pred, latent_post, latent_prior


def joint_future_pred(
    cfg: ExperimentCfg,
    model: TrafficBots,
    params,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    n_joint_future: Optional[int] = None,
    check_level: int = 1,
    use_gt_latent_prior: bool = True,
):
    """Sample K joint futures: prior latent + predicted navi per future
    (waymo_motion.py:439-524). Returns (pp, flattened buffer [n_sc, K, ...])."""
    k = cfg.n_joint_future_wosac if n_joint_future is None else n_joint_future
    k_lat, k_navi, k_tf, k_roll = jax.random.split(key, 4)
    pp = pre_processing(batch, tl_mode=cfg.model.tl_mode, navi_mode=cfg.model.navi_mode,
                        n_step_hist=cfg.n_step_hist, training="agent/valid" in batch)
    mp_tokens, tl_tokens = encode_scene(cfg, model, params, pp)

    latent_prior = model.apply({"params": params}, pp.ag_valid, pp.ag_attr, pp.ag_motion, pp.ag_pose,
                               pp.ag_type, pp.tl_state.astype(jnp.float32), mp_tokens, tl_tokens, False,
                               method="encode_latent")
    navi_dist = model.apply({"params": params}, pp.ag_valid, pp.ag_attr, pp.ag_motion, pp.ag_pose,
                            pp.ag_type, mp_tokens, method="predict_navi")

    # The TL transition is deterministic (argmax + GT override) and never sees
    # agent state, so the K replicated futures share ONE TL trajectory: run
    # the TL-only scan on the un-replicated scenarios (K x fewer rows) and
    # drop the TL encoder from the K-expanded main scan (sim/tl_prepass.py).
    tl_pre = None
    if cfg.tl_prepass and cfg.model.temp_window_size > 0:
        tl_pre = tl_prepass.tl_rollout_scan(
            model, params, tl_tokens, pp.tl_state.astype(jnp.float32),
            jnp.ones(pp.tl_state.shape[:3], bool), cfg.time_step_end,
            cfg.model.temp_window_size, deterministic=True,
        )

    # repeat everything K times along the scenario axis. With token dedup the
    # map/TL tokens stay UNIQUE — the rollout folds the K replicas into the
    # agent axis of the per-step gathers (sim/rollout.py token_rep), which
    # read K-times smaller tensors for bit-identical results (PERF.md
    # chain12). Requires the TL pre-pass (the in-scan TL encoder path and the
    # in-scan NaviPredictor are not wired for unique tokens).
    rep = lambda x: _repeat(x, k)
    token_rep = 1
    tl_valid_full, tl_pose_full = rep(tl_tokens.valid), rep(tl_tokens.pose)
    if (cfg.rollout_token_dedup and tl_pre is not None
            and not cfg.pred_navi_after_reached):
        token_rep = k
    else:
        mp_tokens = jax.tree_util.tree_map(lambda x: _repeat(x, k), mp_tokens)
        tl_tokens = jax.tree_util.tree_map(lambda x: _repeat(x, k), tl_tokens)

    n_sc, n_ag = pp.ag_valid.shape[:2]
    if cfg.joint_future_pred_deterministic_k0:
        det = jnp.zeros((n_sc * k, n_ag), bool).at[::k].set(True)
    else:
        det = False

    ag_latent = ag_latent_valid = latent_log_prob = None
    if latent_prior is not None:
        lat = latent_prior.repeat(k, 0)
        ag_latent = lat.sample(k_lat, det)
        ag_latent_valid = lat.valid
        latent_log_prob = jnp.where(ag_latent_valid, lat.log_prob(ag_latent), 0.0)

    ag_dest = batch.get("agent/dest")
    ag_goal = batch.get("agent/goal")
    ag_dest = None if ag_dest is None else rep(ag_dest)
    ag_goal = None if ag_goal is None else rep(ag_goal)
    if navi_dist is None:
        ag_navi = None
        ag_navi_valid = jnp.zeros((n_sc * k, n_ag), bool)
        ag_navi_log_prob = jnp.zeros((n_sc * k, n_ag))
    else:
        nd = navi_dist.repeat(k, 0)
        ag_navi = nd.sample(k_navi, det)
        ag_navi_valid = nd.valid
        ag_navi_log_prob = jnp.where(ag_navi_valid, nd.log_prob(ag_navi), 0.0)
        if cfg.model.navi_mode == "goal":
            ag_goal = ag_navi
        elif cfg.model.navi_mode == "dest":
            ag_dest = ag_navi

    statics, state0 = init_rule_checker(
        mp_boundary=rep(batch["map/boundary"]), mp_valid=rep(batch["map/valid"]),
        mp_type=rep(batch["map/type"]).astype(bool), mp_pos=rep(batch["map/pos"]),
        mp_dir=rep(batch["map/dir"]), ag_type=rep(pp.ag_type), ag_size=rep(pp.ag_size),
        tl_valid=tl_valid_full, tl_pose=tl_pose_full, ag_goal=ag_goal, ag_dest=ag_dest,
    )
    # joint future: GT = history only (spawn/warm-start <= step 10)
    gt_valid, gt_pose, gt_motion = rep(pp.ag_valid), rep(pp.ag_pose), rep(pp.ag_motion)
    gt_tl_state = rep(pp.tl_state).astype(jnp.float32)
    tl_forcing0 = jnp.ones(gt_tl_state.shape[:3], bool)
    ag_forcing, tl_forcing = build_forcing_masks(
        cfg.teacher_forcing_joint_future_pred, gt_valid, tl_forcing0, 0, k_tf
    )
    buffer = rollout_lib.rollout(
        model, params, cfg, mp_tokens, tl_tokens,
        ag_attr=rep(pp.ag_attr), ag_type=rep(pp.ag_type), ag_size=rep(pp.ag_size),
        ag_latent=ag_latent, ag_latent_valid=ag_latent_valid,
        ag_navi=ag_navi, ag_navi_valid=ag_navi_valid, ag_navi_log_prob=ag_navi_log_prob,
        gt_valid=gt_valid, gt_pose=gt_pose, gt_motion=gt_motion, gt_tl_state=gt_tl_state,
        ag_forcing=ag_forcing, tl_forcing=tl_forcing,
        rule_statics=statics, rule_state0=state0, check_level=check_level,
        key=k_roll, deterministic_action=True, train=False,
        navi_update_inputs=_navi_update_inputs(cfg, batch, rep),
        tf_cfg=cfg.teacher_forcing_joint_future_pred,
        tl_precomputed=tl_pre,
        token_rep=token_rep,
    )
    buffer = rollout_lib.compute_log_prob(buffer, latent_log_prob)
    return pp, buffer.flatten_joint_future(k)
