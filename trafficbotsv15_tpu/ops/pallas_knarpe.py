"""Fused Pallas KNARPE attention kernel.

The hot op of the HPTR backbone (SURVEY §3 hot-loop #4): per-source KNN
attention with relative-pose-embedding biases,

    rpe_kv  = rpe @ W_rpe + b_rpe                  (MXU)
    logits  = sum(q * (k + rpe_k)) / sqrt(d_head)  (VPU)
    attn    = masked softmax over K                (VPU)
    out     = sum(attn * (v + rpe_v))              (VPU)

The XLA fallback (ops.attention.knn_attention) materializes rpe_k/rpe_v
[n_b, n_src, K, d_model] in HBM (2 x 64 MB per mp2mp layer at flagship
scale). This kernel keeps the projection output in VMEM: per grid step it
loads a tile of sources with their gathered K/V and raw rpe, projects on the
MXU and finishes attention without round-tripping to HBM.

Backward pass: jax.custom_vjp re-runs the XLA reference implementation under
jax.vjp (recompute strategy) — forward speed/memory win, bit-identical
gradients.

Layouts (all contiguous):
    q:       [B, S, D]           (D = n_head * d_head)
    k, v:    [B, S, K, D]        (gathered per source)
    rpe:     [B, S, K, R]        (raw relative-pose embedding)
    w_rpe:   [R, 2 D], b_rpe: [2 D]
    invalid: [B, S, K]  bool
    out:     [B, S, D]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trafficbotsv15_tpu.ops.attention import knn_attention

_MASK = -1e9


def _kernel(q_ref, k_ref, v_ref, rpe_ref, inv_ref, w_ref, b_ref, out_ref, *, n_head: int):
    """One tile of S_TILE sources; full K and D resident in VMEM.
    Block shapes keep the leading (size-1) batch dim: k_ref is [1, S_TILE, K, D]."""
    _, s_tile, n_knn, d_model = k_ref.shape
    d_head = d_model // n_head

    # project rpe: [s_tile * K, R] @ [R, 2D] -> rpe_k, rpe_v
    rpe = rpe_ref[...].reshape(s_tile * n_knn, -1)
    rpe_kv = jnp.dot(rpe, w_ref[...], preferred_element_type=jnp.float32) + b_ref[...]
    rpe_k = rpe_kv[:, :d_model].reshape(s_tile, n_knn, n_head, d_head)
    rpe_v = rpe_kv[:, d_model:].reshape(s_tile, n_knn, n_head, d_head)

    k = k_ref[...].reshape(s_tile, n_knn, n_head, d_head) + rpe_k
    v = v_ref[...].reshape(s_tile, n_knn, n_head, d_head) + rpe_v
    q = q_ref[...].reshape(s_tile, 1, n_head, d_head)

    scale = 1.0 / jnp.sqrt(jnp.asarray(d_head, jnp.float32))
    logits = jnp.sum(q * k, axis=-1) * scale  # [s_tile, K, n_head]
    inv = inv_ref[...].reshape(s_tile, n_knn)[:, :, None]  # [s_tile, K, 1]
    logits = jnp.where(inv, _MASK, logits)

    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    e = jnp.where(inv, 0.0, e)
    denom = jnp.sum(e, axis=1, keepdims=True)
    no_valid = denom <= 0.0
    attn = e / jnp.where(no_valid, 1.0, denom)  # [s_tile, K, n_head]

    out = jnp.sum(attn[..., None] * v, axis=1)  # [s_tile, n_head, d_head]
    # reshape (not int-index) — Mosaic lowers integer indexing as a gather
    out = jnp.where(no_valid.reshape(s_tile, n_head)[:, :, None], 0.0, out)
    out_ref[...] = out.reshape(1, s_tile, d_model)


def _knarpe_fwd_pallas(q, k, v, rpe, invalid, w_rpe, b_rpe, n_head: int, s_tile: int):
    n_b, n_s, n_knn, d_model = k.shape
    r = rpe.shape[-1]
    grid = (n_b, pl.cdiv(n_s, s_tile))

    return pl.pallas_call(
        functools.partial(_kernel, n_head=n_head),
        out_shape=jax.ShapeDtypeStruct((n_b, n_s, d_model), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, s_tile, d_model), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn, d_model), lambda b, s: (b, s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn, d_model), lambda b, s: (b, s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn, r), lambda b, s: (b, s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 2 * d_model), lambda b, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * d_model,), lambda b, s: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_tile, d_model), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
    )(q, k, v, rpe, invalid, w_rpe, b_rpe)


def _reference(q, k, v, rpe, invalid, w_rpe, b_rpe, n_head):
    """XLA reference path (identical math; used for backward + fallback)."""
    n_b, n_s, n_knn, d_model = k.shape
    d_head = d_model // n_head
    rpe_kv = rpe @ w_rpe + b_rpe
    rpe_k = rpe_kv[..., :d_model].reshape(n_b, n_s, n_knn, n_head, d_head)
    rpe_v = rpe_kv[..., d_model:].reshape(n_b, n_s, n_knn, n_head, d_head)
    out, _ = knn_attention(
        q.reshape(n_b, n_s, n_head, d_head),
        k.reshape(n_b, n_s, n_knn, n_head, d_head),
        v.reshape(n_b, n_s, n_knn, n_head, d_head),
        invalid,
        rpe_k=rpe_k,
        rpe_v=rpe_v,
    )
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def knarpe_attention(q, k, v, rpe, invalid, w_rpe, b_rpe, n_head: int, s_tile: int = 128):
    """Fused KNN-RPE attention. Shapes per module docstring. Returns [B, S, D]."""
    return _knarpe_fwd_pallas(q, k, v, rpe, invalid, w_rpe, b_rpe, n_head, s_tile)


def _fwd(q, k, v, rpe, invalid, w_rpe, b_rpe, n_head, s_tile):
    out = _knarpe_fwd_pallas(q, k, v, rpe, invalid, w_rpe, b_rpe, n_head, s_tile)
    return out, (q, k, v, rpe, invalid, w_rpe, b_rpe)


def _bwd(n_head, s_tile, residuals, g):
    q, k, v, rpe, invalid, w_rpe, b_rpe = residuals
    _, vjp = jax.vjp(lambda *a: _reference(*a, n_head), q, k, v, rpe, invalid, w_rpe, b_rpe)
    grads = vjp(g)
    return grads


knarpe_attention.defvjp(_fwd, _bwd)


def knarpe_attention_reference(q, k, v, rpe, invalid, w_rpe, b_rpe, n_head: int):
    """Public XLA fallback with the same signature (CPU tests, non-TPU backends)."""
    return _reference(q, k, v, rpe, invalid, w_rpe, b_rpe, n_head)
