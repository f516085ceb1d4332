"""Sequence pooling over the step/node axis.

Parity target: /root/reference/src/utils/pooling.py (seq_pooling).
"""

from __future__ import annotations

import jax.numpy as jnp

_NEG = -1e9  # large-negative fill; avoids -inf propagating through max of all-invalid rows


def seq_pooling(x: jnp.ndarray, invalid: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Pool [n_sc, n, n_step, d] -> [n_sc, n, d] along axis 2.

    Args:
        x: [n_sc, n, n_step, d]
        invalid: [n_sc, n, n_step] bool
        mode: max_valid | first | last | last_valid | mean_valid
    Rows with no valid step are zeroed.
    """
    if mode == "max_valid":
        pooled = jnp.max(jnp.where(invalid[..., None], _NEG, x), axis=2)
    elif mode == "first":
        pooled = x[:, :, 0]
    elif mode == "last":
        pooled = x[:, :, -1]
    elif mode == "last_valid":
        n_step = invalid.shape[2]
        valid = ~invalid
        # index of last valid step; 0 if none valid (masked out below anyway)
        rev_first = jnp.argmax(valid[:, :, ::-1], axis=2)
        idx_last = n_step - 1 - rev_first
        pooled = jnp.take_along_axis(x, idx_last[:, :, None, None], axis=2)[:, :, 0]
    elif mode == "mean_valid":
        valid = ~invalid
        s = jnp.sum(jnp.where(invalid[..., None], 0.0, x), axis=2)
        cnt = jnp.sum(valid, axis=2, keepdims=True).astype(x.dtype)
        pooled = s / (cnt + jnp.finfo(x.dtype).eps)
    else:
        raise NotImplementedError(mode)

    all_invalid = jnp.all(invalid, axis=-1, keepdims=True)
    return jnp.where(all_invalid, 0.0, pooled)
