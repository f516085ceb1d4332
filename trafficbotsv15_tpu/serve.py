"""Interactive simulation API for serving / gym-style closed-loop use.

The reference only runs offline rollouts inside Lightning steps (plus a dead
`player_policy` stub, waymo_motion.py:228-238). For production serving this
module exposes the same policy as a stateful stepper: encode a scenario once,
then advance the world one step at a time — optionally overriding any agent's
action externally (e.g. an ego planner under test). All device state stays
resident; each step is ONE jitted call. Measured on the v5e (flagship 10M,
1 scenario x 64 agents): fetch=False ~2 ms/step async; fetch=True adds the
blocking host transfer, which dominates on this image's tunneled device
(~126 ms/step — a remote-dispatch artifact, not model time).

Example:
    sim = InteractiveSimulator(cfg, params)
    obs = sim.reset(batch, jax.random.PRNGKey(0))
    for t in range(80):
        obs = sim.step()                      # all agents policy-driven
        # or: sim.step(actions={"valid": m, "action": a})  # scripted agents
    trajs = sim.history()
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from trafficbotsv15_tpu.config import ExperimentCfg
from trafficbotsv15_tpu.data.preprocessing import pre_processing
from trafficbotsv15_tpu.sim import dynamics as dyn
from trafficbotsv15_tpu.train.pipeline import build_model


class InteractiveSimulator:
    def __init__(self, cfg: ExperimentCfg, params, deterministic_action: bool = True):
        self.cfg = cfg
        self.params = params
        self.model = build_model(cfg)
        self.det_action = deterministic_action
        self._jit_encode = jax.jit(self._encode)
        self._jit_step = jax.jit(self._step)
        self._state = None
        self._trajs = []

    # ---------------------------------------------------------------- internals
    def _encode(self, params, pp, key):
        k_lat, k_navi = jax.random.split(key)
        model = self.model
        mp_tokens = model.apply({"params": params}, pp.mp_valid, pp.mp_attr, pp.mp_pose, pp.mp_type,
                                method="encode_map")
        tl_tokens = model.apply({"params": params}, pp.tl_valid, pp.tl_attr, pp.tl_pose, mp_tokens,
                                method="precompute_tl")
        latent = model.apply({"params": params}, pp.ag_valid, pp.ag_attr, pp.ag_motion, pp.ag_pose,
                             pp.ag_type, pp.tl_state.astype(jnp.float32), mp_tokens, tl_tokens, False,
                             method="encode_latent")
        navi_dist = model.apply({"params": params}, pp.ag_valid, pp.ag_attr, pp.ag_motion, pp.ag_pose,
                                pp.ag_type, mp_tokens, method="predict_navi")
        ag_latent = None if latent is None else latent.sample(k_lat, False)
        ag_latent_valid = None if latent is None else latent.valid
        ag_navi = None if navi_dist is None else navi_dist.sample(k_navi, False)
        ag_navi_valid = (
            jnp.zeros(pp.ag_valid.shape[:2], bool) if navi_dist is None else navi_dist.valid
        )
        return mp_tokens, tl_tokens, ag_latent, ag_latent_valid, ag_navi, ag_navi_valid

    def _step(self, params, state, player):
        cfg, model = self.cfg, self.model
        (valid, pose, motion, tl_state, hist, key, static) = state
        (mp_tokens, tl_tokens, ag_attr, ag_type, ag_latent, ag_latent_valid,
         ag_navi, ag_navi_valid) = static
        key, k_act = jax.random.split(key)

        hist_valid = jnp.concatenate([hist["valid"][:, :, 1:], valid[:, :, None]], axis=2)
        hist_pose = jnp.concatenate([hist["pose"][:, :, 1:], pose[:, :, None]], axis=2)
        hist_motion = jnp.concatenate([hist["motion"][:, :, 1:], motion[:, :, None]], axis=2)
        hist_tl = jnp.concatenate([hist["tl"][:, :, 1:], tl_state[:, :, None]], axis=2)
        hist_inv = jnp.concatenate([hist["step_invalid"][1:], jnp.zeros((1,), bool)])

        action_dist, tl_logits, _, _ = model.apply(
            {"params": params},
            ag_valid=valid, hist_ag_valid=hist_valid, hist_ag_pose=hist_pose,
            hist_ag_motion=hist_motion, hist_tl_state=hist_tl, hist_step_invalid=hist_inv,
            ag_attr=ag_attr, ag_type=ag_type, ag_latent=ag_latent, ag_latent_valid=ag_latent_valid,
            ag_navi=ag_navi, ag_navi_valid=ag_navi_valid,
            tl_tokens=tl_tokens, mp_tokens=mp_tokens, method="step",
        )
        action = action_dist.sample(k_act, self.det_action)
        new_pose, new_motion, bounded = dyn.step_dynamics(
            pose, motion, valid, action, ag_type, cfg.dynamics, player_override=player
        )
        new_tl = dyn.override_tl(
            tl_logits, jnp.zeros(tl_state.shape[:2], bool), jnp.zeros_like(tl_state).astype(bool)
        ).astype(jnp.float32)
        new_hist = dict(valid=hist_valid, pose=hist_pose, motion=hist_motion, tl=hist_tl,
                        step_invalid=hist_inv)
        new_state = (valid, new_pose, new_motion, new_tl, new_hist, key, static)
        return new_state, dict(valid=valid, pose=new_pose, motion=new_motion,
                               tl_state=new_tl, action=bounded)

    # ------------------------------------------------------------------- API
    def reset(self, batch: Dict[str, np.ndarray], key: jax.Array) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        batch = {k: jnp.asarray(np.asarray(v)) for k, v in batch.items() if not isinstance(v, list)}
        pp = pre_processing(batch, tl_mode=cfg.model.tl_mode, navi_mode=cfg.model.navi_mode,
                            n_step_hist=cfg.n_step_hist, training="agent/valid" in batch)
        k_enc, key = jax.random.split(key)
        mp_tokens, tl_tokens, ag_latent, ag_latent_valid, ag_navi, ag_navi_valid = self._jit_encode(
            self.params, pp, k_enc)

        W = max(cfg.model.temp_window_size, 1)
        n_sc, n_ag = pp.ag_valid.shape[:2]
        n_tl = pp.tl_valid.shape[1]
        # seed the rolling window with the observed history
        h = min(W, pp.ag_valid.shape[2])
        hist = dict(
            valid=jnp.zeros((n_sc, n_ag, W), bool).at[:, :, -h:].set(pp.ag_valid[:, :, -h:]),
            pose=jnp.zeros((n_sc, n_ag, W, 3)).at[:, :, -h:].set(pp.ag_pose[:, :, -h:]),
            motion=jnp.zeros((n_sc, n_ag, W, 3)).at[:, :, -h:].set(pp.ag_motion[:, :, -h:]),
            tl=jnp.zeros((n_sc, n_tl, W, 5)).at[:, :, -h:].set(pp.tl_state[:, :, -h:].astype(jnp.float32)),
            step_invalid=jnp.concatenate([jnp.ones((W - h,), bool), jnp.zeros((h,), bool)]),
        )
        static = (mp_tokens, tl_tokens, pp.ag_attr, pp.ag_type, ag_latent, ag_latent_valid,
                  ag_navi, ag_navi_valid)
        self._state = (
            pp.ag_valid[:, :, -1], pp.ag_pose[:, :, -1], pp.ag_motion[:, :, -1],
            pp.tl_state[:, :, -1].astype(jnp.float32), hist, key, static,
        )
        self._trajs = []
        return dict(valid=np.asarray(self._state[0]), pose=np.asarray(self._state[1]),
                    motion=np.asarray(self._state[2]))

    def step(self, actions: Optional[Dict[str, np.ndarray]] = None,
             fetch: bool = True) -> Dict[str, np.ndarray]:
        """Advance one 0.1 s step. `actions` optionally scripts agents:
        {"valid": [n_sc, n_ag] bool, "action": [n_sc, n_ag, 2] (acc, yaw_rate)}.

        fetch=False keeps the observation on-device (async dispatch, no host
        sync): use it when the caller only needs the observation occasionally
        — on tunneled/remote devices the per-step blocking transfer dominates
        the latency; history() materializes everything at the end."""
        assert self._state is not None, "call reset() first"
        player = None
        if actions is not None:
            player = {"valid": jnp.asarray(actions["valid"]), "action": jnp.asarray(actions["action"])}
        self._state, out = self._jit_step(self.params, self._state, player)
        if fetch:
            out = {k: np.asarray(v) for k, v in out.items()}
        self._trajs.append(out)
        return out

    def history(self) -> Dict[str, np.ndarray]:
        """Stacked trajectory so far: each [n_sc, n_ag, n_step, ...]."""
        if not self._trajs:
            return {}
        keys = self._trajs[0].keys()
        return {k: np.stack([np.asarray(t[k]) for t in self._trajs], axis=2) for k in keys}
