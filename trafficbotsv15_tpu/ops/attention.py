"""KNARPE attention core math (jnp reference implementation).

Parity target: /root/reference/src/models/modules/attention_rpe.py:120-182.
Three K/V layouts are supported:
  - dense:    k, v [n_b, n_tgt, n_head, d_head]           (normal attention)
  - per-src:  k, v [n_b, n_src, n_knn, n_head, d_head]     (KNN-gathered)
  - per-src + RPE biases rpe_k / rpe_v / rpe_q of the same per-src layout.

The all-invalid guard (attention_rpe.py:112-118) is realized by computing the
softmax with masked logits and zeroing rows whose targets are all invalid —
no NaNs are ever produced because at least one logit is kept finite.

The fused Pallas kernel in trafficbotsv15_tpu.ops.pallas_knarpe implements the
per-src RPE layout; this module is the always-correct XLA fallback and the
ground truth for kernel tests.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

_MASK_VALUE = -1e9


def head_segments(d_model: int, n_head: int, dtype=jnp.float32) -> jnp.ndarray:
    """Block-diagonal head indicator seg[d, h] = 1 iff lane d belongs to head h.

    Per-head reductions become [.., d_model] @ [d_model, n_head] matmuls
    (MXU) so the lane dim never needs a head split/reshape. Single source of
    truth for the head layout — used by the fullwidth attention paths and the
    Pallas kernels."""
    d_head = d_model // n_head
    return (jnp.arange(d_model)[:, None] // d_head == jnp.arange(n_head)[None, :]).astype(dtype)


def _masked_softmax(logits: jnp.ndarray, invalid: Optional[jnp.ndarray]) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Softmax over the last axis with bool invalid mask broadcast over heads.

    Returns (attn, no_valid) where no_valid marks rows with zero valid targets
    (their attn output must be zeroed by the caller).
    """
    if invalid is None:
        return jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True)) / jnp.sum(
            jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True)), axis=-1, keepdims=True
        ), None
    logits = jnp.where(invalid, _MASK_VALUE, logits)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    e = jnp.where(invalid, 0.0, e)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    no_valid = denom <= 0.0
    attn = e / jnp.where(no_valid, 1.0, denom)
    return attn, no_valid[..., 0]


def dense_attention(
    q: jnp.ndarray,  # [n_b, n_src, n_head, d_head]
    k: jnp.ndarray,  # [n_b, n_tgt, n_head, d_head]
    v: jnp.ndarray,  # [n_b, n_tgt, n_head, d_head]
    invalid: Optional[jnp.ndarray],  # [n_b, n_src, n_tgt] bool or None
    attn_drop_fn=None,  # optional fn applied to the softmaxed weights
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Standard MHA. Returns (out [n_b, n_src, n_head*d_head], attn [n_b, n_head, n_src, n_tgt])."""
    d_head = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d_head, q.dtype))
    logits = jnp.einsum("bshd,bthd->bhst", q, k) * scale
    inv = None if invalid is None else invalid[:, None, :, :]
    attn, no_valid = _masked_softmax(logits, inv)
    if attn_drop_fn is not None:
        attn = attn_drop_fn(attn)
    out = jnp.einsum("bhst,bthd->bshd", attn, v)
    if no_valid is not None:
        out = jnp.where(no_valid.transpose(0, 2, 1)[..., None], 0.0, out)
    n_b, n_src = q.shape[:2]
    return out.reshape(n_b, n_src, -1), attn


def knn_attention_fullwidth(
    q: jnp.ndarray,  # [n_b, n_src, d_model]
    kf: jnp.ndarray,  # [n_b, n_src, n_knn, d_model]  (k + rpe_k, full width)
    vf: jnp.ndarray,  # [n_b, n_src, n_knn, d_model]
    invalid: Optional[jnp.ndarray],  # [n_b, n_src, n_knn] bool or None
    n_head: int,
    attn_drop_fn=None,  # optional fn applied to the softmaxed weights
) -> jnp.ndarray:
    """knn_attention on full-width (pre-head-split) K/V via head-segment
    matmuls: the per-head q.k reduction runs as [.., d_model] @ [d_model,
    n_head] on the MXU instead of a transposed VPU multiply-reduce, and no
    [.., K, d_model] layout copies are needed around a head split. Exact same
    math as knn_attention (sum reassociation only). Returns [n_b, n_src,
    d_model]."""
    n_b, n_src, n_knn, d_model = kf.shape
    d_head = d_model // n_head
    seg = head_segments(d_model, n_head, q.dtype)
    scale = 1.0 / jnp.sqrt(jnp.asarray(d_head, jnp.float32))

    prod = q[:, :, None, :] * kf  # [b, s, K, D], minor dim untouched
    logits = jnp.einsum("bskd,dh->bshk", prod.astype(jnp.float32), seg.astype(jnp.float32)) * scale
    inv = None if invalid is None else invalid[:, :, None, :]
    attn, no_valid = _masked_softmax(logits, inv)  # [b, s, h, K]
    if attn_drop_fn is not None:
        attn = attn_drop_fn(attn)
    attn_full = jnp.einsum("bshk,hd->bskd", attn.astype(q.dtype), seg.T)
    out = jnp.sum(attn_full * vf, axis=2)  # [b, s, D]
    if no_valid is not None:
        nv_full = jnp.einsum("bsh,hd->bsd", no_valid.astype(q.dtype), seg.T)
        out = jnp.where(nv_full > 0, 0.0, out)
    return out


def knn_attention(
    q: jnp.ndarray,  # [n_b, n_src, n_head, d_head]
    k: jnp.ndarray,  # [n_b, n_src, n_knn, n_head, d_head]
    v: jnp.ndarray,  # [n_b, n_src, n_knn, n_head, d_head]
    invalid: Optional[jnp.ndarray],  # [n_b, n_src, n_knn] bool or None
    rpe_k: Optional[jnp.ndarray] = None,  # [n_b, n_src, n_knn, n_head, d_head]
    rpe_v: Optional[jnp.ndarray] = None,
    rpe_q: Optional[jnp.ndarray] = None,
    attn_drop_fn=None,  # optional fn applied to the softmaxed weights
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KNN/RPE attention with per-source gathered targets.

    attn_logits = sum((q [+ rpe_q]) * (k [+ rpe_k])) / sqrt(d_head)
    out = sum(attn * (v [+ rpe_v]))

    Returns (out [n_b, n_src, n_head*d_head], attn [n_b, n_src, n_head, n_knn]).
    """
    d_head = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d_head, q.dtype))
    if rpe_k is not None:
        k = k + rpe_k
    qx = q[:, :, None, :, :]  # [n_b, n_src, 1, n_head, d_head]
    if rpe_q is not None:
        qx = qx + rpe_q
    logits = jnp.sum(qx * k, axis=-1) * scale  # [n_b, n_src, n_knn, n_head]
    logits = jnp.swapaxes(logits, 2, 3)  # [n_b, n_src, n_head, n_knn]
    inv = None if invalid is None else invalid[:, :, None, :]
    attn, no_valid = _masked_softmax(logits, inv)
    if attn_drop_fn is not None:
        attn = attn_drop_fn(attn)
    if rpe_v is not None:
        v = v + rpe_v
    out = jnp.einsum("bshk,bskhd->bshd", attn, v)
    if no_valid is not None:
        out = jnp.where(no_valid[..., None], 0.0, out)
    n_b, n_src = q.shape[:2]
    return out.reshape(n_b, n_src, -1), attn
