"""Stochastic weight averaging / EMA of parameters.

Parity target: the reference configures PL's StochasticWeightAveraging
callback (configs/callbacks/wandb.yaml). Implemented as pure pytree updates:
equal-weight running average from a start step (SWA) or exponential moving
average (EMA); either can be swapped in for evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def swa_init(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params), jnp.zeros(())


def swa_update(swa_state, params, step: jnp.ndarray, start_step: int):
    """Equal-weight average of params for steps >= start_step."""
    avg, count = swa_state
    take = (step >= start_step).astype(jnp.float32)
    new_count = count + take
    w = take / jnp.maximum(new_count, 1.0)
    new_avg = jax.tree_util.tree_map(lambda a, p: a + (p - a) * w, avg, params)
    return new_avg, new_count


def swa_params(swa_state, fallback):
    """Averaged params, or fallback when no update happened yet."""
    avg, count = swa_state
    use = count > 0
    return jax.tree_util.tree_map(lambda a, p: jnp.where(use, a, p), avg, fallback)


def ema_init(params):
    # explicit copy: astype(f32) on f32 params is a no-op alias, and the live
    # training loop donates params to the train step — an aliased EMA would
    # point at deleted buffers one step later
    return jax.tree_util.tree_map(lambda p: jnp.array(p, jnp.float32), params)


def ema_update(ema, params, decay: float = 0.999):
    return jax.tree_util.tree_map(lambda e, p: e * decay + p * (1.0 - decay), ema, params)
