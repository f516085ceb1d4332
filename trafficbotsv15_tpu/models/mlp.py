"""MLP, InputEncoder and PolylineEncoder as flax modules.

Parity targets: /root/reference/src/models/modules/mlp.py,
input_encoder.py, polyline_encoder.py. Masking semantics are preserved:
invalid rows are filled (default 0) after the MLP so padded agents/nodes never
leak through max-pools or residuals.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

_ACT = {
    "relu": nn.relu,
    "gelu": nn.gelu,
    "elu": nn.elu,
    "leaky_relu": nn.leaky_relu,
}

_NEG = -1e9


class MLP(nn.Module):
    """Linear stack with optional LayerNorm / dropout and invalid masking."""

    fc_dims: Sequence[int]  # output dims of each layer (input dim inferred)
    dropout_p: float = -1.0
    activation: str = "relu"
    end_layer_activation: bool = True
    use_layernorm: bool = False
    init_bias: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, invalid=None, fill_invalid: float = 0.0, deterministic: bool = True):
        act = _ACT[self.activation]
        n = len(self.fc_dims)
        for i, dim in enumerate(self.fc_dims):
            is_last = i == n - 1
            bias_init = nn.initializers.zeros
            if self.init_bias is not None and is_last:
                bias_init = nn.initializers.constant(self.init_bias)
            x = nn.Dense(dim, dtype=self.dtype, bias_init=bias_init, name=f"fc{i}")(x)
            if (not is_last) or self.end_layer_activation:
                if self.use_layernorm:
                    x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"ln{i}")(x)
                x = act(x)
            if self.dropout_p > 0:
                x = nn.Dropout(self.dropout_p, deterministic=deterministic, name=f"drop{i}")(x)
        if invalid is not None:
            x = jnp.where(invalid[..., None], fill_invalid, x)
        return x


class InputEncoder(nn.Module):
    """Fuse attribute features with a pose embedding (modes input/cat/add)."""

    hidden_dim: int
    pe_dim: int
    n_layer: int
    mode: str  # "input" | "cat" | "add"
    mlp_dropout_p: float = 0.0
    mlp_use_layernorm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, attr, pe, deterministic: bool = True):
        if self.mode == "input":
            out_dim = self.hidden_dim
        elif self.mode == "cat":
            out_dim = self.hidden_dim - self.pe_dim
            assert out_dim >= 8, "pe_dim too large for cat mode"
        elif self.mode == "add":
            out_dim = self.hidden_dim
            assert self.pe_dim in (0, self.hidden_dim)
        else:
            raise NotImplementedError(self.mode)

        mlp = MLP(
            [out_dim] * self.n_layer,
            dropout_p=self.mlp_dropout_p,
            use_layernorm=self.mlp_use_layernorm,
            end_layer_activation=False,
            dtype=self.dtype,
            name="mlp",
        )
        if pe is None:
            return mlp(attr, deterministic=deterministic)
        if self.mode == "input":
            return mlp(jnp.concatenate([attr, pe], axis=-1), deterministic=deterministic)
        if self.mode == "cat":
            return jnp.concatenate([mlp(attr, deterministic=deterministic), pe.astype(self.dtype)], axis=-1)
        return mlp(attr, deterministic=deterministic) + pe.astype(self.dtype)


class PolylineEncoder(nn.Module):
    """VectorNet-style PointNet: n_layer x [MLP -> half dim, concat masked max],
    then sequence pooling (polyline_encoder.py:36-63)."""

    hidden_dim: int
    n_layer: int
    pooling_mode: str = "max_valid"
    mlp_dropout_p: float = 0.0
    mlp_use_layernorm: bool = False
    use_pointnet: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, invalid, deterministic: bool = True):
        """x: [n_sc, n, n_node, hidden], invalid: [n_sc, n, n_node] -> [n_sc, n, hidden]."""
        from trafficbotsv15_tpu.ops.pooling import seq_pooling

        assert self.use_pointnet, "transformer polyline encoder not used by the flagship config"
        n_node = invalid.shape[-1]
        for i in range(self.n_layer):
            x = MLP(
                [self.hidden_dim // 2],
                dropout_p=self.mlp_dropout_p,
                use_layernorm=self.mlp_use_layernorm,
                dtype=self.dtype,
                name=f"pointnet{i}",
            )(x, invalid, fill_invalid=_NEG, deterministic=deterministic)
            pooled = jnp.max(x, axis=2, keepdims=True)
            x = jnp.concatenate([x, jnp.broadcast_to(pooled, x.shape)], axis=-1)
            x = jnp.where(invalid[..., None], 0.0, x)
        return seq_pooling(x, invalid, self.pooling_mode)
