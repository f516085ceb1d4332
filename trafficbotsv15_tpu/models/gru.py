"""Multi-agent stacked GRU.

Parity target: /root/reference/src/models/modules/multi_agent_gru.py.
The sequence mode runs a jax.lax.scan over the step axis (the reference loops
in python); invalid (scene, agent, step) entries zero both the hidden state
and the output, so padded agents carry no state.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class MultiAgentGRU(nn.Module):
    hidden_dim: int
    n_layer: int
    dropout_p: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def init_hidden(self, n_sc: int, n_ag: int) -> jnp.ndarray:
        return jnp.zeros((self.n_layer, n_sc, n_ag, self.hidden_dim), dtype=self.dtype)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        invalid: jnp.ndarray,
        h: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """
        Step mode:  x [n_sc, n_ag, d], invalid [n_sc, n_ag]
        Seq mode:   x [n_sc, n_ag, n_step, d], invalid [n_sc, n_ag, n_step]

        Returns (x_out same leading shape, h [n_layer, n_sc, n_ag, d] or None in seq mode).
        """
        cells = [nn.GRUCell(self.hidden_dim, dtype=self.dtype, name=f"gru{i}") for i in range(self.n_layer)]
        drops = [
            nn.Dropout(self.dropout_p, deterministic=deterministic, name=f"drop{i}")
            for i in range(self.n_layer - 1)
        ]
        n_sc, n_ag = invalid.shape[0], invalid.shape[1]
        if h is None:
            h = self.init_hidden(n_sc, n_ag)

        def cell_stack(hs, inp):
            """One time step through the layer stack. hs: [n_layer, n_sc, n_ag, d]."""
            new_hs = []
            out = inp
            for i, cell in enumerate(cells):
                h_i, out = cell(hs[i], out)
                if i < self.n_layer - 1 and self.dropout_p > 0:
                    out = drops[i](out)
                new_hs.append(h_i)
            # tagged for remat_policy="names" (selective BPTT save)
            from jax.ad_checkpoint import checkpoint_name

            return checkpoint_name(jnp.stack(new_hs, axis=0), "gru_hidden"), out

        if invalid.ndim == 2:  # single step
            new_h, out = cell_stack(h, x)
            new_h = jnp.where(invalid[None, :, :, None], 0.0, new_h)
            out = jnp.where(invalid[..., None], 0.0, out)
            return out, new_h

        # sequence mode: scan over the step axis
        xs = jnp.moveaxis(x, 2, 0)  # [n_step, n_sc, n_ag, d]
        invs = jnp.moveaxis(invalid, 2, 0)  # [n_step, n_sc, n_ag]

        def step(carry_h, inputs):
            x_t, inv_t = inputs
            new_h, out = cell_stack(carry_h, x_t)
            new_h = jnp.where(inv_t[None, :, :, None], 0.0, new_h)
            out = jnp.where(inv_t[..., None], 0.0, out)
            return new_h, out

        if self.is_initializing():
            # materialize params without running the scan
            _, out0 = step(h, (xs[0], invs[0]))
            outs = jnp.broadcast_to(out0[None], (xs.shape[0],) + out0.shape)
        else:
            _, outs = jax.lax.scan(step, h, (xs, invs))
        return jnp.moveaxis(outs, 0, 2), None
