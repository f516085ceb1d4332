"""Closed-loop rollout as a single fixed-shape jax.lax.scan.

Parity target: the 90-iteration python loop in
/root/reference/src/pl_modules/waymo_motion.py:206-311 plus the per-step
forward (:118-204). The reference's stateful Dynamics / TeacherForcing /
RolloutBuffer objects map onto:

  - SimCarry: the scan carry (agent state, rolling history window, tl state,
    rule-checker accumulators, RNN hiddens, PRNG key)
  - per-step xs: pre-computed teacher-forcing overrides + GT slices
  - stacked scan outputs: the RolloutBuffer

Gradient semantics match the reference exactly: with detach_model_input the
encoder sees stop_gradient'ed states (written into the history window), while
the pose/motion chain through the dynamics integrator keeps gradients, so BPTT
flows through the 90-step action chain only (waymo_motion.py:158-161).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from trafficbotsv15_tpu.config import ExperimentCfg
from trafficbotsv15_tpu.models.tokens import MapTokens, TlTokens
from trafficbotsv15_tpu.sim import dynamics as dyn
from trafficbotsv15_tpu.sim import rewards as rew
from trafficbotsv15_tpu.sim.rule_checker import RuleCheckerState, RuleCheckerStatics, check_rules
from trafficbotsv15_tpu.sim.teacher_forcing import error_reset_mask


@struct.dataclass
class SimCarry:
    valid: jnp.ndarray  # [n_sc, n_ag]
    disabled: jnp.ndarray  # [n_sc, n_ag]
    pose: jnp.ndarray  # [n_sc, n_ag, 3]
    motion: jnp.ndarray  # [n_sc, n_ag, 3]
    tl_state: jnp.ndarray  # [n_sc, n_tl, 5] float
    hist_valid: jnp.ndarray  # [n_sc, n_ag, W]
    hist_pose: jnp.ndarray  # [n_sc, n_ag, W, 3]
    hist_motion: jnp.ndarray  # [n_sc, n_ag, W, 3]
    hist_tl_state: jnp.ndarray  # [n_sc, n_tl, W, 5]
    hist_step_invalid: jnp.ndarray  # [W] bool (True = slot not yet filled)
    rule_state: RuleCheckerState
    navi: Optional[jnp.ndarray]  # [n_sc, n_ag(, navi_dim)] current navigation target
    navi_valid: jnp.ndarray  # [n_sc, n_ag] (invalidated once reached, dynamics.py:183-204)
    dyn_statics: Optional[RuleCheckerStatics]  # carried only with pred_navi_after_reached
    rnn_hidden: Optional[jnp.ndarray]
    tl_rnn_hidden: Optional[jnp.ndarray]
    key: jax.Array


@struct.dataclass
class RolloutBuffer:
    """Stacked rollout outputs, step axis at dim 2 (buffer.py:80-101)."""

    pred_valid: jnp.ndarray  # [n_sc, n_ag, n_step]
    pred_pose: jnp.ndarray  # [n_sc, n_ag, n_step, 3]
    pred_motion: jnp.ndarray  # [n_sc, n_ag, n_step, 3]
    pred_action: jnp.ndarray  # [n_sc, n_ag, n_step, 2] bounded (acc, steer), for vis
    action_log_prob: jnp.ndarray  # [n_sc, n_ag, n_step]
    tl_state_nll: jnp.ndarray  # [n_sc, n_tl, n_step]
    tl_state_nll_invalid: jnp.ndarray  # [n_sc, n_tl, n_step]
    mask_teacher_forcing: jnp.ndarray  # [n_sc, n_ag, n_step]
    diffbar_reward: Dict[str, jnp.ndarray]  # each [n_sc, n_ag, n_step]
    violation: Dict[str, jnp.ndarray]  # each [n_sc, n_ag, n_step]
    tl_state: jnp.ndarray  # [n_sc, n_tl, n_step, 5] (post-override, for vis/eval)
    navi_log_prob: jnp.ndarray  # [n_sc, n_ag, 1]
    navi_log_prob_valid: jnp.ndarray  # [n_sc, n_ag, 1]
    log_prob: Optional[jnp.ndarray] = None  # [n_sc, n_ag] joint-future scores

    def flatten_joint_future(self, k: int) -> "RolloutBuffer":
        """[n_sc*k, ...] -> [n_sc, k, ...] on every leaf (buffer.py:115-146)."""
        def r(x):
            if x is None:
                return None
            return x.reshape(x.shape[0] // k, k, *x.shape[1:])
        return jax.tree_util.tree_map(r, self)


def compute_log_prob(buffer: RolloutBuffer, latent_log_prob: Optional[jnp.ndarray]) -> RolloutBuffer:
    """Joint-future scores from navi + latent log probs (buffer.py:107-113)."""
    lp = jnp.sum(buffer.navi_log_prob * buffer.navi_log_prob_valid, axis=-1)
    denom = jnp.sum(buffer.navi_log_prob_valid, axis=-1)
    lp = jnp.where(denom > 0, lp / jnp.maximum(denom, 1), 0.0)
    if latent_log_prob is not None:
        lp = lp + latent_log_prob.reshape(lp.shape)
    return dataclasses.replace(buffer, log_prob=lp)


def _pad_gt_to(arr: jnp.ndarray, n_step_roll: int, fill=0):
    """GT arrays cover steps [0, T); rollout needs steps [1, n_step_roll]. Pad."""
    t = arr.shape[2]
    need = n_step_roll + 1
    if t >= need:
        return arr[:, :, 1:need]
    pad = [(0, 0), (0, 0), (0, need - t)] + [(0, 0)] * (arr.ndim - 3)
    return jnp.pad(arr, pad, constant_values=fill)[:, :, 1:need]


def rollout(
    model,
    params,
    cfg: ExperimentCfg,
    mp_tokens: MapTokens,
    tl_tokens: TlTokens,
    # static per-agent inputs
    ag_attr: jnp.ndarray,  # [n_sc, n_ag, attr]
    ag_type: jnp.ndarray,  # [n_sc, n_ag, 3]
    ag_size: jnp.ndarray,  # [n_sc, n_ag, 3]
    ag_latent: Optional[jnp.ndarray],
    ag_latent_valid: Optional[jnp.ndarray],
    ag_navi: Optional[jnp.ndarray],
    ag_navi_valid: jnp.ndarray,
    ag_navi_log_prob: jnp.ndarray,  # [n_sc, n_ag]
    # ground truth (only first gt_valid.shape[2] steps available)
    gt_valid: jnp.ndarray,  # [n_sc, n_ag, T]
    gt_pose: jnp.ndarray,
    gt_motion: jnp.ndarray,
    gt_tl_state: jnp.ndarray,  # [n_sc, n_tl, T_tl, 5]
    # teacher forcing (precomputed masks over GT steps)
    ag_forcing: jnp.ndarray,  # [n_sc, n_ag, T]
    tl_forcing: jnp.ndarray,  # [n_sc, n_tl, T_tl]
    # rule checking
    rule_statics: RuleCheckerStatics,
    rule_state0: RuleCheckerState,
    check_level: int,
    # control
    key: jax.Array,
    step_end: Optional[int] = None,
    deterministic_action: bool = True,
    train: bool = False,
    remat: bool = True,
    # optional externally-scripted agents (the reference's player_override
    # hook, waymo_motion.py:150-152/237-238): precomputed per-step actions
    player_valid: Optional[jnp.ndarray] = None,  # [n_sc, n_ag, n_step_roll]
    player_action: Optional[jnp.ndarray] = None,  # [n_sc, n_ag, n_step_roll, 2]
    # map arrays for navi re-prediction (required iff cfg.pred_navi_after_reached:
    # dest statics are re-derived when an agent gets a new dest,
    # traffic_rule_checker.py:321-340)
    navi_update_inputs: Optional[Dict[str, jnp.ndarray]] = None,
    # per-flavor teacher-forcing config for the error-threshold reset; the
    # reference threads a separate config per rollout flavor
    # (teacher_forcing.py:107-167). None = cfg.teacher_forcing_training.
    tf_cfg=None,
    # TL pre-pass (sim/tl_prepass.py): {"feature": [n_step, n_sc_u, n_tl, D],
    # "logits": [n_step, n_sc_u, n_tl, 5], "state": [n_step, n_sc_u, n_tl, 5]}
    # with n_sc_u dividing n_sc (joint-future computes TL once per unique
    # scenario; the body repeats to the K-replicated batch). When given, the
    # scan body skips the TL encoder/predictor and the TL window carry.
    tl_precomputed: Optional[Dict[str, jnp.ndarray]] = None,
    # K-futures static-token dedup (PERF.md chain12): mp_tokens / tl_tokens
    # carry the UNIQUE scenarios [n_sc // token_rep, ...] shared by token_rep
    # consecutive rollout rows; the per-step map/TL feature+pose gathers then
    # read K-times smaller tensors. Requires the TL pre-pass (the rule
    # checker statics stay at the full batch — built by the caller).
    token_rep: int = 1,
) -> RolloutBuffer:
    """Run the closed-loop simulation from step 1 to step_end inclusive.

    With remat (training default) the scan body is wrapped in jax.checkpoint:
    BPTT over 90 steps would otherwise store every step's encoder activations
    (~10s of GB at flagship batch); rematerialization recomputes them in the
    backward pass, trading one extra forward for O(carry) memory."""
    step_end = cfg.time_step_end if step_end is None else step_end
    n_step_roll = step_end  # steps 1..step_end
    n_sc, n_ag, t_gt = gt_valid.shape
    n_tl = gt_tl_state.shape[1]
    W = max(cfg.model.temp_window_size, 1)
    detach = cfg.training_detach_model_input

    # ---- per-step scan inputs (teacher forcing + GT slices), [n_step_roll, ...]
    def to_steps(x):
        return jnp.moveaxis(x, 2, 0)

    tf_valid = _pad_gt_to(ag_forcing, n_step_roll, False)
    tf_pose = _pad_gt_to(gt_pose, n_step_roll)
    tf_motion = _pad_gt_to(gt_motion, n_step_roll)
    gt_valid_s = _pad_gt_to(gt_valid, n_step_roll, False)
    tl_forcing_s = _pad_gt_to(tl_forcing, n_step_roll, False)
    gt_tl_state_s = _pad_gt_to(gt_tl_state, n_step_roll, False)
    t_tl = gt_tl_state.shape[2]
    tl_avail = (jnp.arange(1, n_step_roll + 1) < t_tl)  # [n_step_roll]
    gt_avail = (jnp.arange(1, n_step_roll + 1) < t_gt)
    # previous-step GT for error-threshold resets
    gt_valid_prev = _pad_gt_to(jnp.roll(gt_valid, 1, axis=2), n_step_roll, False)
    gt_pose_prev = _pad_gt_to(jnp.roll(gt_pose, 1, axis=2), n_step_roll)
    gt_motion_prev = _pad_gt_to(jnp.roll(gt_motion, 1, axis=2), n_step_roll)

    tl_pre = tl_precomputed is not None
    assert token_rep == 1 or tl_pre, "token dedup requires the TL pre-pass"
    if token_rep > 1:
        assert mp_tokens.feature.shape[0] * token_rep == n_sc, (
            f"unique map batch {mp_tokens.feature.shape[0]} x rep {token_rep}"
            f" != rollout batch {n_sc}")
    if tl_pre:
        assert cfg.model.temp_window_size > 0, "TL pre-pass requires HPTR mode"
        n_sc_u = tl_precomputed["feature"].shape[1]
        assert n_sc % n_sc_u == 0, (
            f"prepass batch {n_sc_u} does not divide rollout batch {n_sc}")
        assert tl_precomputed["feature"].shape[0] == n_step_roll, (
            f"prepass step count {tl_precomputed['feature'].shape[0]} != "
            f"rollout steps {n_step_roll}")
        tl_rep = n_sc // n_sc_u
        assert token_rep in (1, tl_rep), (token_rep, tl_rep)

    xs = dict(
        tf_valid=to_steps(tf_valid),
        tf_pose=to_steps(tf_pose),
        tf_motion=to_steps(tf_motion),
        gt_valid=to_steps(gt_valid_s),
        gt_pose=to_steps(tf_pose),  # identical tensor: GT pose at step
        gt_motion=to_steps(tf_motion),
        gt_valid_prev=to_steps(gt_valid_prev),
        gt_pose_prev=to_steps(gt_pose_prev),
        gt_motion_prev=to_steps(gt_motion_prev),
        # with the TL pre-pass the body neither overrides TL nor computes the
        # NLL, so the TL GT streams stay out of the scan xs entirely
        **({} if tl_pre else dict(
            tl_forcing=to_steps(tl_forcing_s),
            gt_tl_state=to_steps(gt_tl_state_s),
            tl_avail=tl_avail,
        )),
        gt_avail=gt_avail,
    )
    if player_valid is not None:
        xs["player_valid"] = to_steps(player_valid)
        xs["player_action"] = to_steps(player_action)
    if tl_pre:
        xs["tl_feature_pre"] = tl_precomputed["feature"]
        xs["tl_state_pre"] = tl_precomputed["state"]

    # RNN mode (temp_window_size <= 0): GRU hiddens join the scan carry
    rnn_hidden0 = tl_rnn_hidden0 = None
    if cfg.model.temp_window_size <= 0:
        h = cfg.model.hidden_dim
        n_layer_gru = cfg.model.mp_encoder.pl_encoder.n_layer
        rnn_hidden0 = jnp.zeros((n_layer_gru, n_sc, n_ag, h), jnp.float32)
        tl_rnn_hidden0 = jnp.zeros((cfg.model.tl_state_predictor.n_layer, n_sc, n_tl, h), jnp.float32)

    navi_mode = cfg.model.navi_mode
    repredict_navi = bool(cfg.pred_navi_after_reached) and navi_mode in ("dest", "goal")
    if repredict_navi:
        assert navi_update_inputs is not None, "pred_navi_after_reached needs map arrays"
        assert token_rep == 1, (
            "token dedup not wired through the in-scan NaviPredictor; "
            "callers gate dedup off when pred_navi_after_reached is set")

    # ---- initial carry: state at step 0 (dynamics.py:29-64)
    carry = SimCarry(
        valid=gt_valid[:, :, 0],
        disabled=jnp.zeros((n_sc, n_ag), bool),
        pose=gt_pose[:, :, 0],
        motion=gt_motion[:, :, 0],
        tl_state=(jnp.zeros((1,), jnp.float32) if tl_pre
                  else gt_tl_state[:, :, 0].astype(jnp.float32)),
        hist_valid=jnp.zeros((n_sc, n_ag, W), bool),
        hist_pose=jnp.zeros((n_sc, n_ag, W, 3), gt_pose.dtype),
        hist_motion=jnp.zeros((n_sc, n_ag, W, 3), gt_motion.dtype),
        hist_tl_state=(jnp.zeros((1,), jnp.float32) if tl_pre
                       else jnp.zeros((n_sc, n_tl, W, 5), jnp.float32)),
        hist_step_invalid=jnp.ones((W,), bool),
        rule_state=rule_state0,
        navi=ag_navi,
        navi_valid=ag_navi_valid,
        dyn_statics=rule_statics if repredict_navi else None,
        rnn_hidden=rnn_hidden0,
        tl_rnn_hidden=tl_rnn_hidden0,
        key=key,
    )

    if tf_cfg is None:
        tf_cfg = cfg.teacher_forcing_training  # thresholds only; mask already precomputed

    def step_fn(c: SimCarry, x) -> Tuple[SimCarry, Any]:
        key, k_action, k_drop, k_navi = jax.random.split(c.key, 4)

        # push current (post-override) state into the rolling window — detached
        # when training_detach_model_input (encoder input only).
        sg = jax.lax.stop_gradient if detach else (lambda v: v)
        hist_valid = jnp.concatenate([c.hist_valid[:, :, 1:], c.valid[:, :, None]], axis=2)
        hist_pose = jnp.concatenate([c.hist_pose[:, :, 1:], sg(c.pose)[:, :, None]], axis=2)
        hist_motion = jnp.concatenate([c.hist_motion[:, :, 1:], sg(c.motion)[:, :, None]], axis=2)
        if tl_pre:
            hist_tl = c.hist_tl_state  # dummy; TL window lives in the pre-pass
            tl_feature_pre = x["tl_feature_pre"]
            tl_state_pre = x["tl_state_pre"]
            if tl_rep > 1:
                # token dedup: the model consumes the UNIQUE TL feature (the
                # ag2tl gather folds the replicas into the agent axis); only
                # the TL state — fed to the full-batch rule checker — repeats
                if token_rep == 1:
                    tl_feature_pre = jnp.repeat(tl_feature_pre, tl_rep, axis=0)
                tl_state_pre = jnp.repeat(tl_state_pre, tl_rep, axis=0)
        else:
            hist_tl = jnp.concatenate([c.hist_tl_state[:, :, 1:], sg(c.tl_state)[:, :, None]], axis=2)
        hist_step_invalid = jnp.concatenate([c.hist_step_invalid[1:], jnp.zeros((1,), bool)])

        from trafficbotsv15_tpu.ops import flags
        from trafficbotsv15_tpu.ops.rpe import onehot_gather_scope

        # one-hot matmul gathers in the rollout scan for BOTH train and eval:
        # training avoids the backward scatter-add; in eval the native gather
        # runs ~30 GB/s inside the big scan body while the one-hot rides the
        # MXU (A/B on v5e: 127.8k -> 141.0k agent-steps/s, docs/PERF.md).
        # flags.onehot_gather / TB_ONEHOT_GATHER=0 disables it everywhere.
        _onehot = flags.get().onehot_gather
        rngs = {"dropout": k_drop} if train else None
        with onehot_gather_scope(_onehot):
            action_dist, tl_logits, rnn_hidden, tl_rnn_hidden = model.apply(
            {"params": params},
            ag_valid=c.valid,
            hist_ag_valid=hist_valid,
            hist_ag_pose=hist_pose,
            hist_ag_motion=hist_motion,
            hist_tl_state=None if tl_pre else hist_tl,
            tl_token_feature=tl_feature_pre if tl_pre else None,
            hist_step_invalid=hist_step_invalid,
            ag_attr=ag_attr,
            ag_type=ag_type,
            ag_latent=ag_latent,
            ag_latent_valid=ag_latent_valid,
            ag_navi=c.navi,
            ag_navi_valid=c.navi_valid,
            tl_tokens=tl_tokens,
            mp_tokens=mp_tokens,
            rnn_hidden=c.rnn_hidden,
            tl_rnn_hidden=c.tl_rnn_hidden,
            deterministic=not train,
            method="step",
            rngs=rngs,
            token_rep=token_rep,
        )

        # sample action, integrate dynamics (dynamics.py:66-120)
        action_unbounded = action_dist.sample(k_action, deterministic_action)
        action_log_prob = action_dist.log_prob(jax.lax.stop_gradient(action_unbounded))
        action_log_prob = jnp.where(c.valid, action_log_prob, 0.0)
        player = None
        if "player_valid" in x:
            player = {"valid": x["player_valid"], "action": x["player_action"]}
        new_pose, new_motion, action_bounded = dyn.step_dynamics(
            c.pose, c.motion, c.valid, action_unbounded, ag_type, cfg.dynamics,
            player_override=player,
        )

        pred_valid, pred_pose, pred_motion = c.valid, new_pose, new_motion

        # teacher forcing override (+ optional error-threshold reset). The
        # reference computes the reset BEFORE the model forward: the error is
        # the PREVIOUS post-override state (carry, step t-1) vs GT at t-1 —
        # same-step frames (teacher_forcing.py:131-145, get() is called with
        # dynamics state pre-update at waymo_motion.py:234-236). Comparing the
        # freshly integrated pose at t against GT at t-1 would inflate the
        # error by speed*dt and reset every fast agent. gt_avail gates the
        # reset off beyond the GT horizon, where the reference zeroes the whole
        # override (teacher_forcing.py:128) and tf_pose here is zero padding.
        force = x["tf_valid"] | (
            error_reset_mask(
                tf_cfg, c.valid, jax.lax.stop_gradient(c.pose), jax.lax.stop_gradient(c.motion),
                x["gt_valid_prev"], x["gt_pose_prev"], x["gt_motion_prev"],
            )
            & x["gt_avail"]
        )
        ov_valid, ov_pose, ov_motion = dyn.override_ag(
            pred_valid, pred_pose, pred_motion, c.disabled, force, x["tf_pose"], x["tf_motion"]
        )
        if tl_pre:
            new_tl_state = tl_state_pre
        else:
            new_tl_state = dyn.override_tl(tl_logits, x["tl_forcing"], x["gt_tl_state"]).astype(jnp.float32)

        # rule checking on the pre-override prediction (waymo_motion.py:249-251)
        rule_state, violations = check_rules(
            c.dyn_statics if repredict_navi else rule_statics, c.rule_state,
            jax.lax.stop_gradient(pred_valid), jax.lax.stop_gradient(pred_pose),
            jax.lax.stop_gradient(pred_motion), new_tl_state,
            check_level,
        )

        # differentiable reward vs GT at this step
        step_gt_valid = x["gt_valid"] & x["gt_avail"]
        reward = rew.diffbar_reward(
            cfg.reward, pred_valid, pred_pose, pred_motion,
            step_gt_valid, x["gt_pose"], x["gt_motion"], ag_size,
        )

        if not tl_pre:
            # tl-state NLL vs GT argmax (waymo_motion.py:270-277)
            gt_tl_idx = jnp.argmax(x["gt_tl_state"], axis=-1)
            logp = jax.nn.log_softmax(tl_logits, axis=-1)
            # one-hot dot instead of take_along_axis: keeps the BPTT backward
            # scatter-free (TPU scatters serialize inside the scan backward)
            nll = -jnp.sum(logp * jax.nn.one_hot(gt_tl_idx, logp.shape[-1], dtype=logp.dtype), axis=-1)
            nll = jnp.where(x["tl_avail"], nll, 0.0)
            nll_invalid = jnp.where(x["tl_avail"], tl_tokens.invalid, jnp.ones_like(tl_tokens.invalid))

        # disable agents that left the map unless GT-valid (dynamics.py:165-181)
        ov_valid, disabled = dyn.disable_outside_map(
            ov_valid, c.disabled, violations["outside_map_this_step"], step_gt_valid
        )

        # navi bookkeeping (dynamics.py:183-222): invalidate once reached;
        # optionally re-predict a fresh navi for reached agents
        # (waymo_motion.py:292-308)
        if navi_mode == "dest":
            navi_reached = violations["dest_reached_this_step"]
        elif navi_mode == "goal":
            navi_reached = violations["goal_reached_this_step"]
        else:
            navi_reached = jnp.zeros_like(c.valid)
        navi, navi_valid = dyn.update_navi_on_reached(c.navi, c.navi_valid, navi_reached)
        dyn_statics = c.dyn_statics
        if repredict_navi:
            navi_dist = model.apply(
                {"params": params}, hist_valid, ag_attr, hist_motion, hist_pose, ag_type,
                mp_tokens, deterministic=not train, method="predict_navi", rngs=rngs,
            )
            navi_sample = navi_dist.sample(k_navi, False)
            navi_lp = navi_dist.log_prob(jax.lax.stop_gradient(navi_sample))
            navi, navi_valid = dyn.update_navi_on_reached(
                c.navi, c.navi_valid, navi_reached, navi_sample
            )
            # rule_checker.update_navi (traffic_rule_checker.py:321-340)
            if navi_mode == "dest":
                from trafficbotsv15_tpu.sim.rule_checker import dest_statics_from_navi

                ds = dest_statics_from_navi(navi, **navi_update_inputs)
                upd = jax.tree_util.tree_map(
                    lambda new_v, old_v: jnp.where(
                        navi_reached.reshape(navi_reached.shape + (1,) * (new_v.ndim - 2)), new_v, old_v
                    ),
                    ds, {k: getattr(dyn_statics, k) for k in ds},
                )
                dyn_statics = dataclasses.replace(dyn_statics, **upd)
                rule_state = dataclasses.replace(
                    rule_state, dest_reached=rule_state.dest_reached & ~navi_reached)
            else:
                new_goal = jnp.where(navi_reached[..., None], navi, dyn_statics.ag_goal)
                dyn_statics = dataclasses.replace(dyn_statics, ag_goal=new_goal)
                rule_state = dataclasses.replace(
                    rule_state, goal_reached=rule_state.goal_reached & ~navi_reached)

        out = dict(
            pred_valid=pred_valid,
            pred_pose=pred_pose,
            pred_motion=pred_motion,
            pred_action=jax.lax.stop_gradient(action_bounded),
            action_log_prob=action_log_prob,
            mask_teacher_forcing=force,
            diffbar_reward=reward,
            violation=violations,
        )
        if not tl_pre:  # pre-pass: NLL + tl_state stitched in after the scan
            out["tl_state_nll"] = nll
            out["tl_state_nll_invalid"] = nll_invalid
            out["tl_state"] = new_tl_state
        if repredict_navi:
            out["navi_log_prob"] = jnp.where(navi_reached, navi_lp, 0.0)
            out["navi_log_prob_valid"] = navi_reached
        new_carry = SimCarry(
            valid=ov_valid,
            disabled=disabled,
            pose=ov_pose,
            motion=ov_motion,
            tl_state=c.tl_state if tl_pre else new_tl_state,
            hist_valid=hist_valid,
            hist_pose=hist_pose,
            hist_motion=hist_motion,
            hist_tl_state=hist_tl,
            hist_step_invalid=hist_step_invalid,
            rule_state=rule_state,
            navi=navi,
            navi_valid=navi_valid,
            dyn_statics=dyn_statics,
            rnn_hidden=rnn_hidden,
            tl_rnn_hidden=tl_rnn_hidden,
            key=key,
        )
        return new_carry, out

    policy = getattr(cfg, "remat_policy", "full")
    if train and remat and policy != "none":
        if policy == "dots":
            save_policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        elif policy == "names":
            # selective save of small per-step tensors: the BPTT replay then
            # skips the exact-sort KNN (stop-gradient anyway), dropout
            # threefry re-hashing, and cross-layer recompute chains, at
            # ~O(n_tag * n_sc * n_ag * D) extra HBM per step
            save_policy = jax.checkpoint_policies.save_only_these_names(
                "knn_idx", "knn_invalid", "knn_rpe", "sublayer_out", "gru_hidden"
            )
        elif policy == "names+kv":
            # additionally save the projected K/V (+rpe) blocks — the replay
            # then skips the largest per-step matmuls too, at
            # [n_sc, n_ag, K, 2D] bf16 extra HBM per attention layer per step
            save_policy = jax.checkpoint_policies.save_only_these_names(
                "knn_idx", "knn_invalid", "knn_rpe", "sublayer_out", "gru_hidden",
                "kv_proj",
            )
        else:
            save_policy = None  # "full"
        body = jax.checkpoint(step_fn, prevent_cse=False, policy=save_policy)
    else:
        body = step_fn
    # scan_unroll > 1 replicates the step body inside the compiled while-loop
    # iteration — a lever for the latency-bound body (fewer loop round-trips,
    # more fusion scope) at the cost of compile time; A/B'd via BENCH_UNROLL
    unroll = int(getattr(cfg, "scan_unroll", 1))
    _, outs = jax.lax.scan(body, carry, xs, unroll=unroll if unroll > 1 else 1)

    # step axis first -> step axis at dim 2
    def to_buffer(x):
        return jnp.moveaxis(x, 0, 2)

    if tl_pre:
        # NLL + tl_state trajectory computed once, batched over all steps
        # (same formulas as the in-body path, waymo_motion.py:270-277)
        logits = tl_precomputed["logits"]
        state_pre = tl_precomputed["state"]
        if tl_rep > 1:
            logits = jnp.repeat(logits, tl_rep, axis=1)
            state_pre = jnp.repeat(state_pre, tl_rep, axis=1)
        gt_tl_idx = jnp.argmax(to_steps(gt_tl_state_s), axis=-1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll_all = -jnp.sum(logp * jax.nn.one_hot(gt_tl_idx, logp.shape[-1], dtype=logp.dtype), axis=-1)
        nll_all = jnp.where(tl_avail[:, None, None], nll_all, 0.0)
        outs["tl_state_nll"] = nll_all
        # tl_tokens are unique under token dedup — repeat the mask to the
        # full rollout batch like the logits above
        tl_token_invalid = (jnp.repeat(tl_tokens.invalid, token_rep, axis=0)
                            if token_rep > 1 else tl_tokens.invalid)
        outs["tl_state_nll_invalid"] = tl_token_invalid[None] | ~tl_avail[:, None, None]
        outs["tl_state"] = state_pre

    return RolloutBuffer(
        pred_valid=to_buffer(outs["pred_valid"]),
        pred_pose=to_buffer(outs["pred_pose"]),
        pred_motion=to_buffer(outs["pred_motion"]),
        pred_action=to_buffer(outs["pred_action"]),
        action_log_prob=to_buffer(outs["action_log_prob"]),
        tl_state_nll=to_buffer(outs["tl_state_nll"]),
        tl_state_nll_invalid=to_buffer(outs["tl_state_nll_invalid"]),
        mask_teacher_forcing=to_buffer(outs["mask_teacher_forcing"]),
        diffbar_reward={k: to_buffer(v) for k, v in outs["diffbar_reward"].items()},
        violation={k: to_buffer(v) for k, v in outs["violation"].items()},
        tl_state=to_buffer(outs["tl_state"]),
        navi_log_prob=(
            jnp.concatenate([ag_navi_log_prob[..., None], to_buffer(outs["navi_log_prob"])], axis=-1)
            if repredict_navi else ag_navi_log_prob[..., None]
        ),
        navi_log_prob_valid=(
            jnp.concatenate([ag_navi_valid[..., None], to_buffer(outs["navi_log_prob_valid"])], axis=-1)
            if repredict_navi else ag_navi_valid[..., None]
        ),
    )
