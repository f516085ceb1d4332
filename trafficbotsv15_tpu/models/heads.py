"""Action head and navi/latent fusion.

Parity targets: /root/reference/src/models/modules/action_head.py and
add_navi_latent.py.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from trafficbotsv15_tpu.config import ActionHeadCfg, AddNaviLatentCfg
from trafficbotsv15_tpu.models.mlp import MLP
from trafficbotsv15_tpu.ops.distributions import DiagGaussian


class ActionHead(nn.Module):
    """MLP mean + learned log_std, optionally branched per agent type."""

    cfg: ActionHeadCfg
    hidden_dim: int
    action_dim: int
    n_ag_type: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid, ag_type, deterministic: bool = True) -> DiagGaussian:
        """x: [n_sc, n_ag, hidden]; valid: [n_sc, n_ag]; ag_type one-hot [n_sc, n_ag, 3]."""
        c = self.cfg
        dims = [self.hidden_dim] * (c.n_layer - 1) + [self.action_dim]
        mk = lambda name: MLP(dims, end_layer_activation=False, use_layernorm=c.mlp_use_layernorm,
                              dtype=self.dtype, name=name)
        shape = valid.shape
        if c.branch_type:
            mean, log_std = 0.0, 0.0
            for i in range(self.n_ag_type):
                mask = ~(ag_type[..., i] & valid)
                mean = mean + mk(f"mean{i}")(x, mask, deterministic=deterministic)
                if c.log_std is None:
                    log_std = log_std + mk(f"log_std{i}")(x, mask, deterministic=deterministic)
                else:
                    p = self.param(f"log_std{i}", nn.initializers.constant(c.log_std), (self.action_dim,))
                    log_std = log_std + jnp.where(
                        mask[..., None], 0.0, jnp.broadcast_to(p, shape + (self.action_dim,))
                    )
        else:
            mean = mk("mean")(x, ~valid, deterministic=deterministic)
            if c.log_std is None:
                log_std = mk("log_std")(x, ~valid, deterministic=deterministic)
            else:
                p = self.param("log_std", nn.initializers.constant(c.log_std), (self.action_dim,))
                log_std = jnp.broadcast_to(p, shape + (self.action_dim,))
        # heads feed the dynamics integrator and log-prob losses: keep fp32
        mean = mean.astype(jnp.float32)
        log_std = log_std.astype(jnp.float32) if not isinstance(log_std, float) else log_std
        return DiagGaussian(mean, jnp.exp(log_std), valid=valid)


class AddNaviLatent(nn.Module):
    """Fuse a conditioning vector z (navi feature or latent) into the agent
    feature with add/mul/cat + residual (add_navi_latent.py:33-65)."""

    cfg: AddNaviLatentCfg
    hidden_dim: int
    dummy: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z, z_valid: Optional[jnp.ndarray] = None, deterministic: bool = True):
        if self.dummy or z is None:
            return x
        c = self.cfg
        if z_valid is None:
            z_valid = jnp.ones(x.shape[:-1], dtype=bool)
        z_invalid = ~z_valid

        z = MLP([self.hidden_dim] * c.n_layer, use_layernorm=c.mlp_use_layernorm,
                dropout_p=c.mlp_dropout_p, dtype=self.dtype, name="mlp_in")(
            z.astype(self.dtype), deterministic=deterministic
        )
        if c.mode == "add":
            h = x + jnp.where(z_invalid[..., None], 0.0, z)
        elif c.mode == "mul":
            h = x * jnp.where(z_invalid[..., None], 1.0, z)
        elif c.mode == "cat":
            h = jnp.concatenate([x, jnp.where(z_invalid[..., None], 0.0, z)], axis=-1)
        else:
            raise NotImplementedError(c.mode)
        h = MLP([self.hidden_dim] * c.n_layer, use_layernorm=c.mlp_use_layernorm,
                dropout_p=c.mlp_dropout_p, dtype=self.dtype, name="mlp")(
            h, z_invalid, deterministic=deterministic
        )
        if c.res_add:
            return h + x
        return h + jnp.where(z_valid[..., None], 0.0, x)
