"""Traffic-light pre-pass: hoist the TL subsystem out of the rollout scan.

The TL encoder + state predictor (models/traffic_light.py, parity target
/root/reference/src/models/traffic_light.py:156-287) consume ONLY the rolling
TL-state window and the scenario-static TlTokens — never agent state. The
reference nevertheless recomputes them inside its 90-iteration python rollout
loop (waymo_motion.py:206-311) because its history lives as module state.
Here the TL trajectory is hoisted out of the main lax.scan, in two regimes:

1. `tl_rollout_forced` — TL fully teacher-forced to GT for every rollout step
   (the training recipe and reactive replay: tl_forcing is all-True and the GT
   covers the horizon, train/pipeline.py:147). The window contents are then
   pure GT slices, so ALL steps are encoded in ONE vmapped call: 90 tiny
   per-step encoder launches (poor MXU utilisation at n_tl=128 rows) become
   one batched matmul stack. BPTT also stops replaying the TL encoder inside
   the remat'd scan body — its activations are stored once, outside.

2. `tl_rollout_scan` — TL free-runs beyond the GT horizon (the WOSAC
   joint-future workload: only 11 history steps of TL GT). The transition
   tl_{t+1} = override(argmax(predict(encode(window_t))), gt_t) is
   deterministic and agent-independent, so the K=32 replicated futures share
   ONE trajectory: this scan runs on the un-replicated scenarios (32x fewer
   rows) and the main 128-row scan body drops the TL encoder entirely.

Both return step-axis-first arrays fed to `rollout(tl_precomputed=...)`.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from trafficbotsv15_tpu.models.tokens import TlTokens
from trafficbotsv15_tpu.sim import dynamics as dyn


def _step_invalid_table(n_step_roll: int, w: int) -> jnp.ndarray:
    """[n_step_roll, W] bool: slot j of the window at rollout step t=i+1 holds
    the state of step t-W+j; it is invalid (left zero-padding) iff t-W+j < 0.
    Matches the SimCarry hist_step_invalid shift-register exactly."""
    t = jnp.arange(1, n_step_roll + 1)[:, None]
    j = jnp.arange(w)[None, :]
    return (t - w + j) < 0


def _windows_from_states(states_seq: jnp.ndarray, n_step_roll: int, w: int) -> jnp.ndarray:
    """Build all rolling windows from a known state trajectory.

    states_seq: [n_sc, n_tl, T, 5] with T >= n_step_roll (states at steps
    0..n_step_roll-1 are used). Returns [n_step_roll, n_sc, n_tl, W, 5] where
    window[i] covers steps (i+1)-W .. i, left-zero-padded below step 0 —
    the exact contents the scan's shift register would hold at iteration i.
    """
    pad = jnp.zeros(states_seq.shape[:2] + (w - 1,) + states_seq.shape[3:], states_seq.dtype)
    padded = jnp.concatenate([pad, states_seq[:, :, :n_step_roll]], axis=2)
    idx = jnp.arange(n_step_roll)[:, None] + jnp.arange(w)[None, :]  # [n, W]
    win = jnp.take(padded, idx.reshape(-1), axis=2)  # [n_sc, n_tl, n*W, 5]
    win = win.reshape(states_seq.shape[:2] + (n_step_roll, w) + states_seq.shape[3:])
    return jnp.moveaxis(win, 2, 0)


def fully_forced(tl_forcing, tl_forcing_all_true=None) -> bool:
    """Trace-time check that TL is teacher-forced everywhere — the regime
    `tl_rollout_forced` is valid for (ADVICE r4 #1: the callers' gate must
    track the actual forcing mask, not just the GT horizon shape).

    Callers build an all-ones mask and pass it through build_forcing_masks;
    when the returned mask IS that object (identity — the function returned it
    untouched), TL forcing is provably all-True without inspecting values.
    The identity check is what makes this trace-safe: under jit, omnistaging
    turns even jnp.ones into a tracer, so a value-based `bool(all(...))`
    would raise (or, worse, a Tracer guard would silently disable the
    pre-pass inside every jitted step while eager parity tests keep passing —
    the exact bug this signature replaces). A mask that was reconstructed or
    partially modified falls back to the value check, which then only
    succeeds outside jit."""
    if tl_forcing_all_true is not None and tl_forcing is tl_forcing_all_true:
        return True
    if isinstance(tl_forcing, jax.core.Tracer):
        return False
    return bool(jnp.all(tl_forcing))


def tl_rollout_forced(
    model,
    params,
    tl_tokens: TlTokens,
    states_seq: jnp.ndarray,  # [n_sc, n_tl, T, 5] float, T >= n_step_roll + 1
    n_step_roll: int,
    temp_window_size: int,
    deterministic: bool = True,
    key: Optional[jax.Array] = None,  # dropout keys when not deterministic
) -> Dict[str, jnp.ndarray]:
    """All-steps-batched TL encode for the fully-teacher-forced regimes.

    Correct iff the post-override TL state at every rollout step equals
    states_seq[:, :, step] — i.e. tl_forcing is all-True and the GT horizon
    covers n_step_roll + 1 states (callers gate on both).
    """
    w = temp_window_size
    windows = _windows_from_states(states_seq, n_step_roll, w)  # [n, n_sc, n_tl, W, 5]
    step_inv = _step_invalid_table(n_step_roll, w)  # [n, W]

    if deterministic:
        def one(win, sinv):
            return model.apply({"params": params}, win, sinv, tl_tokens,
                               deterministic=True, method="step_tl")
        feature, logits = jax.vmap(one)(windows, step_inv)
    else:
        keys = jax.random.split(key, n_step_roll)

        def one(win, sinv, k):
            return model.apply({"params": params}, win, sinv, tl_tokens,
                               deterministic=False, method="step_tl",
                               rngs={"dropout": k})
        feature, logits = jax.vmap(one)(windows, step_inv, keys)

    return {
        "feature": feature,  # [n, n_sc, n_tl, D]
        "logits": logits,  # [n, n_sc, n_tl, 5]
        "state": jnp.moveaxis(states_seq[:, :, 1 : n_step_roll + 1], 2, 0).astype(jnp.float32),
    }


def tl_rollout_scan(
    model,
    params,
    tl_tokens: TlTokens,
    gt_tl_state: jnp.ndarray,  # [n_sc, n_tl, T_tl, 5] float (history-only is fine)
    tl_forcing: jnp.ndarray,  # [n_sc, n_tl, T_tl] bool
    n_step_roll: int,
    temp_window_size: int,
    deterministic: bool = True,
    key: Optional[jax.Array] = None,
) -> Dict[str, jnp.ndarray]:
    """TL-only scan for the free-running regime (joint-future prediction).

    Reproduces the main rollout's TL handling exactly (sim/rollout.py):
    override to GT where forcing & GT available, else argmax one-hot of the
    predicted logits. Deterministic in eval, so the K replicated futures can
    share the result of this un-replicated scan.
    """
    w = temp_window_size
    n_sc, n_tl = gt_tl_state.shape[:2]
    t_tl = gt_tl_state.shape[2]

    def pad_to(arr, fill=0):
        t = arr.shape[2]
        need = n_step_roll + 1
        if t >= need:
            return arr[:, :, 1:need]
        p = [(0, 0), (0, 0), (0, need - t)] + [(0, 0)] * (arr.ndim - 3)
        return jnp.pad(arr, p, constant_values=fill)[:, :, 1:need]

    xs = dict(
        tl_forcing=jnp.moveaxis(pad_to(tl_forcing, False), 2, 0),
        gt_tl_state=jnp.moveaxis(pad_to(gt_tl_state), 2, 0),
        tl_avail=jnp.arange(1, n_step_roll + 1) < t_tl,
    )
    if not deterministic:
        xs["key"] = jax.random.split(key, n_step_roll)

    carry = dict(
        tl_state=gt_tl_state[:, :, 0].astype(jnp.float32),
        hist=jnp.zeros((n_sc, n_tl, w, 5), jnp.float32),
        hist_step_invalid=jnp.ones((w,), bool),
    )

    def body(c, x):
        hist = jnp.concatenate([c["hist"][:, :, 1:], c["tl_state"][:, :, None]], axis=2)
        hist_step_invalid = jnp.concatenate([c["hist_step_invalid"][1:], jnp.zeros((1,), bool)])
        rngs = {"dropout": x["key"]} if not deterministic else None
        feature, logits = model.apply(
            {"params": params}, hist, hist_step_invalid, tl_tokens,
            deterministic=deterministic, method="step_tl", rngs=rngs,
        )
        force = x["tl_forcing"] & x["tl_avail"]
        new_state = dyn.override_tl(logits, force, x["gt_tl_state"]).astype(jnp.float32)
        new_c = dict(tl_state=new_state, hist=hist, hist_step_invalid=hist_step_invalid)
        return new_c, dict(feature=feature, logits=logits, state=new_state)

    _, outs = jax.lax.scan(body, carry, xs)
    return outs
