"""Fused Pallas KNARPE attention kernel (forward + backward).

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

Mosaic layout rules shape the kernel (this is why it looks different from
the XLA math): reshapes may only split/collapse *leading* dims — the lane
(minor) dim must stay intact — so the per-head split [.., n_head, d_head]
is never materialized. Instead all tensors stay [rows, d_model] and the
per-head reductions/broadcasts run through tiny block-diagonal segment
matmuls seg [D, H] / segT [H, D] (MXU, ~2 MFLOP per tile).

Backward: a second Pallas kernel recomputes the forward per tile
(flash-attention-style recompute, nothing saved but the inputs) and emits
dq/dk/dv/drpe plus dw_rpe/db_rpe accumulated across the sequential TPU grid.

Layouts (all contiguous):
    q:       [B, S, D]           (D = n_head * d_head)
    k, v:    [B, S, K, D]        (gathered per source)
    rpe:     [B, S, K, R]        (raw relative-pose embedding)
    w_rpe:   [R, 2 D], b_rpe: [2 D]
    invalid: [B, S, K]  bool
    out:     [B, S, D]

Parity target: /root/reference/src/models/modules/attention_rpe.py:137-182.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trafficbotsv15_tpu.ops.attention import knn_attention

_MASK = -1e9


def pallas_available() -> bool:
    """Kill-switch for A/B runs (flags.use_pallas_attention / TB_USE_PALLAS).
    Platform selection itself is handled by lax.platform_dependent at the
    call site, so this only honours the flag."""
    from trafficbotsv15_tpu.ops import flags

    return flags.get().use_pallas_attention


def _head_segments(d_model: int, n_head: int):
    """(seg [D, H], seg.T) — see ops.attention.head_segments (single source
    of truth for the head layout)."""
    from trafficbotsv15_tpu.ops.attention import head_segments

    seg = head_segments(d_model, n_head, jnp.float32)
    return seg, seg.T


def _fwd_core(q, k, v, rpe, inv, w, b, seg, segT, *, n_head: int, scale: float):
    """Shared forward math on 2-D/3-D f32 tiles. q [s,D], k/v [s*K,D] (+rpe),
    rpe [s*K,R], inv [s,K,1] bool. Returns (attn [s,K,H], vv [s,K,D],
    kk [s,K,D], no_valid [s,1,H])."""
    s_tile = q.shape[0]
    n_knn = inv.shape[1]
    d_model = q.shape[-1]

    rpe_kv = jnp.dot(rpe, w, preferred_element_type=jnp.float32) + b
    kk = k + rpe_kv[:, :d_model]
    vv = v + rpe_kv[:, d_model:]
    kk3 = kk.reshape(s_tile, n_knn, d_model)
    vv3 = vv.reshape(s_tile, n_knn, d_model)

    prod = q[:, None, :] * kk3  # [s, K, D]
    logits = jnp.dot(
        prod.reshape(s_tile * n_knn, d_model), seg, preferred_element_type=jnp.float32
    ).reshape(s_tile, n_knn, n_head) * scale
    logits = jnp.where(inv, _MASK, logits)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    e = jnp.where(inv, 0.0, e)
    denom = jnp.sum(e, axis=1, keepdims=True)
    no_valid = denom <= 0.0
    attn = e / jnp.where(no_valid, 1.0, denom)  # [s, K, H]
    return attn, kk3, vv3, no_valid


def _fwd_kernel(q_ref, k_ref, v_ref, rpe_ref, inv_ref, w_ref, b_ref, seg_ref, segT_ref,
                out_ref, *, n_head: int):
    _, s_tile, n_knn, d_model = k_ref.shape
    r = rpe_ref.shape[-1]
    scale = 1.0 / (d_model // n_head) ** 0.5

    q = q_ref[...].reshape(s_tile, d_model).astype(jnp.float32)
    k = k_ref[...].reshape(s_tile * n_knn, d_model).astype(jnp.float32)
    v = v_ref[...].reshape(s_tile * n_knn, d_model).astype(jnp.float32)
    rpe = rpe_ref[...].reshape(s_tile * n_knn, r).astype(jnp.float32)
    # i1 minor-dim insertion is unsupported in Mosaic: go through f32
    inv = inv_ref[...].reshape(s_tile, n_knn).astype(jnp.float32)[:, :, None] > 0.0
    w = w_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    seg, segT = seg_ref[...], segT_ref[...]

    attn, _, vv3, no_valid = _fwd_core(q, k, v, rpe, inv, w, b, seg, segT,
                                       n_head=n_head, scale=scale)

    attn_full = jnp.dot(
        attn.reshape(s_tile * n_knn, n_head), segT, preferred_element_type=jnp.float32
    ).reshape(s_tile, n_knn, d_model)
    out = jnp.sum(attn_full * vv3, axis=1)  # [s, D]
    nv_full = jnp.dot(no_valid.reshape(s_tile, n_head).astype(jnp.float32), segT,
                      preferred_element_type=jnp.float32)
    out = jnp.where(nv_full > 0.0, 0.0, out)
    out_ref[...] = out.reshape(1, s_tile, d_model).astype(out_ref.dtype)


def _row_mask(s_tile: int, n_s: int):
    """[s_tile, 1] bool: True for rows inside the real source range. Padding
    rows of the last grid tile contain UNSPECIFIED data on TPU — every
    backward kernel must zero them before accumulating weight gradients."""
    row = jax.lax.broadcasted_iota(jnp.int32, (s_tile, 1), 0)
    return (pl.program_id(1) * s_tile + row) < n_s


def _bwd_kernel(q_ref, k_ref, v_ref, rpe_ref, inv_ref, w_ref, wT_ref, b_ref,
                seg_ref, segT_ref, g_ref,
                dq_ref, dk_ref, dv_ref, drpe_ref, dw_ref, db_ref, *, n_head: int,
                n_s: int):
    """Recompute-forward backward tile. dw/db accumulate across the sequential
    TPU grid (same VMEM block revisited every step)."""
    _, s_tile, n_knn, d_model = k_ref.shape
    r = rpe_ref.shape[-1]
    scale = 1.0 / (d_model // n_head) ** 0.5

    valid_row = _row_mask(s_tile, n_s)  # [s, 1]
    vrow_kd = jnp.broadcast_to(valid_row[:, None, :], (s_tile, n_knn, 1)).reshape(
        s_tile * n_knn, 1)
    q = jnp.where(valid_row, q_ref[...].reshape(s_tile, d_model).astype(jnp.float32), 0.0)
    k = jnp.where(vrow_kd, k_ref[...].reshape(s_tile * n_knn, d_model).astype(jnp.float32), 0.0)
    v = jnp.where(vrow_kd, v_ref[...].reshape(s_tile * n_knn, d_model).astype(jnp.float32), 0.0)
    rpe = jnp.where(vrow_kd, rpe_ref[...].reshape(s_tile * n_knn, r).astype(jnp.float32), 0.0)
    inv = (inv_ref[...].reshape(s_tile, n_knn).astype(jnp.float32)[:, :, None] > 0.0) | ~valid_row[:, :, None]
    w = w_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    seg, segT = seg_ref[...], segT_ref[...]
    g = jnp.where(valid_row, g_ref[...].reshape(s_tile, d_model).astype(jnp.float32), 0.0)

    attn, kk3, vv3, _ = _fwd_core(q, k, v, rpe, inv, w, b, seg, segT,
                                  n_head=n_head, scale=scale)
    # no_valid rows have attn == 0 everywhere, so every grad below vanishes
    # for them automatically — the out-zeroing clamp needs no special case.

    attn_full = jnp.dot(
        attn.reshape(s_tile * n_knn, n_head), segT, preferred_element_type=jnp.float32
    ).reshape(s_tile, n_knn, d_model)
    g3 = g[:, None, :]  # [s, 1, D]

    dv3 = attn_full * g3  # [s, K, D] — grad wrt vv (= dv and drpe_v)
    dattn = jnp.dot(
        (g3 * vv3).reshape(s_tile * n_knn, d_model), seg, preferred_element_type=jnp.float32
    ).reshape(s_tile, n_knn, n_head)
    s_dot = jnp.sum(attn * dattn, axis=1, keepdims=True)  # [s, 1, H]
    dlogits = attn * (dattn - s_dot)  # [s, K, H]
    dlogits_full = jnp.dot(
        dlogits.reshape(s_tile * n_knn, n_head), segT, preferred_element_type=jnp.float32
    ).reshape(s_tile, n_knn, d_model) * scale
    dq = jnp.sum(dlogits_full * kk3, axis=1)  # [s, D]
    dk3 = dlogits_full * q[:, None, :]  # [s, K, D] — grad wrt kk (= dk and drpe_k)

    dkv = jnp.concatenate(
        [dk3.reshape(s_tile * n_knn, d_model), dv3.reshape(s_tile * n_knn, d_model)], axis=-1
    )  # [s*K, 2D]
    drpe = jnp.dot(dkv, wT_ref[...].astype(jnp.float32), preferred_element_type=jnp.float32)

    dq_ref[...] = dq.reshape(1, s_tile, d_model).astype(dq_ref.dtype)
    dk_ref[...] = dk3.reshape(1, s_tile, n_knn, d_model).astype(dk_ref.dtype)
    dv_ref[...] = dv3.reshape(1, s_tile, n_knn, d_model).astype(dv_ref.dtype)
    drpe_ref[...] = drpe.reshape(1, s_tile, n_knn, r).astype(drpe_ref.dtype)

    # dw = rpe^T @ dkv (TN matmul), db = column-sum of dkv; accumulated over
    # the grid — the TPU grid is sequential so read-modify-write is safe.
    dw_tile = jax.lax.dot_general(
        rpe, dkv, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [R, 2D]
    db_tile = jnp.sum(dkv, axis=0, keepdims=True)  # [1, 2D]

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dw_ref[...] += dw_tile
    db_ref[...] += db_tile


def _pick_s_tile(n_s: int, requested: int, n_knn: int = 0, d_model: int = 0,
                 n_temps: int = 8) -> int:
    """Clamp the source tile so the kernel's fp32 [s_tile, n_knn, d_model]
    temporaries (~n_temps of them) fit the ~16M scoped-VMEM budget — at
    d_model=256 / K=89 the flagship-tuned s_tile=64 stack-OOMs Mosaic."""
    t = max(8, min(requested, n_s))
    if n_knn and d_model:
        budget = 12 * 1024 * 1024  # leave headroom under the 16M limit
        cap = budget // max(n_knn * d_model * 4 * n_temps, 1)
        t = min(t, max((cap // 8) * 8, 8))
    return t


def _knarpe_fwd_pallas(q, k, v, rpe, invalid, w_rpe, b_rpe, n_head: int, s_tile: int,
                       interpret: bool = False):
    n_b, n_s, n_knn, d_model = k.shape
    r = rpe.shape[-1]
    if n_b > 1:
        # the math is per-source: collapse batch into the source axis so the
        # grid is short and each tile is big (64 x 1-tile launches -> a few
        # 128-source tiles at rollout shapes)
        out = _knarpe_fwd_pallas(
            q.reshape(1, n_b * n_s, d_model),
            k.reshape(1, n_b * n_s, n_knn, d_model),
            v.reshape(1, n_b * n_s, n_knn, d_model),
            rpe.reshape(1, n_b * n_s, n_knn, r),
            invalid.reshape(1, n_b * n_s, n_knn),
            w_rpe, b_rpe, n_head, s_tile, interpret,
        )
        return out.reshape(n_b, n_s, d_model)
    s_tile = _pick_s_tile(n_s, s_tile, n_knn, d_model, n_temps=8)
    grid = (n_b, pl.cdiv(n_s, s_tile))
    seg, segT = _head_segments(d_model, n_head)

    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_head=n_head),
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
            pl.BlockSpec((d_model, n_head), lambda b, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_head, d_model), lambda b, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_tile, d_model), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v, rpe, invalid, w_rpe, b_rpe, seg, segT)


def _knarpe_bwd_pallas(q, k, v, rpe, invalid, w_rpe, b_rpe, g, n_head: int, s_tile: int,
                       interpret: bool = False):
    n_b, n_s, n_knn, d_model = k.shape
    r = rpe.shape[-1]
    if n_b > 1:
        grads = _knarpe_bwd_pallas(
            q.reshape(1, n_b * n_s, d_model),
            k.reshape(1, n_b * n_s, n_knn, d_model),
            v.reshape(1, n_b * n_s, n_knn, d_model),
            rpe.reshape(1, n_b * n_s, n_knn, r),
            invalid.reshape(1, n_b * n_s, n_knn),
            w_rpe, b_rpe,
            g.reshape(1, n_b * n_s, d_model),
            n_head, s_tile, interpret,
        )
        dq, dk, dv, drpe, dw, db = grads
        return (dq.reshape(q.shape), dk.reshape(k.shape), dv.reshape(v.shape),
                drpe.reshape(rpe.shape), dw, db)
    s_tile = _pick_s_tile(n_s, s_tile, n_knn, d_model, n_temps=12)
    grid = (n_b, pl.cdiv(n_s, s_tile))
    seg, segT = _head_segments(d_model, n_head)

    out_shapes = (
        jax.ShapeDtypeStruct(q.shape, q.dtype),           # dq
        jax.ShapeDtypeStruct(k.shape, k.dtype),           # dk
        jax.ShapeDtypeStruct(v.shape, v.dtype),           # dv
        jax.ShapeDtypeStruct(rpe.shape, rpe.dtype),       # drpe
        jax.ShapeDtypeStruct((r, 2 * d_model), jnp.float32),   # dw (grid-accumulated)
        jax.ShapeDtypeStruct((1, 2 * d_model), jnp.float32),   # db
    )
    dq, dk, dv, drpe, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, n_head=n_head, n_s=n_s),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, s_tile, d_model), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn, d_model), lambda b, s: (b, s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn, d_model), lambda b, s: (b, s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn, r), lambda b, s: (b, s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 2 * d_model), lambda b, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * d_model, r), lambda b, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * d_model,), lambda b, s: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_model, n_head), lambda b, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_head, d_model), lambda b, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, d_model), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, s_tile, d_model), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn, d_model), lambda b, s: (b, s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn, d_model), lambda b, s: (b, s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn, r), lambda b, s: (b, s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 2 * d_model), lambda b, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * d_model), lambda b, s: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(q, k, v, rpe, invalid, w_rpe, jnp.swapaxes(w_rpe, 0, 1), b_rpe, seg, segT, g)
    return dq, dk, dv, drpe, dw.astype(w_rpe.dtype), db.reshape(-1).astype(b_rpe.dtype)


def _reference(q, k, v, rpe, invalid, w_rpe, b_rpe, n_head):
    """XLA reference path (identical math; fallback + ground truth for tests)."""
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def knarpe_attention(q, k, v, rpe, invalid, w_rpe, b_rpe, n_head: int, s_tile: int = 64,
                     interpret: bool = False):
    """Fused KNN-RPE attention. Shapes per module docstring. Returns [B, S, D]."""
    return _knarpe_fwd_pallas(q, k, v, rpe, invalid, w_rpe, b_rpe, n_head, s_tile, interpret)


def _fwd(q, k, v, rpe, invalid, w_rpe, b_rpe, n_head, s_tile, interpret):
    out = _knarpe_fwd_pallas(q, k, v, rpe, invalid, w_rpe, b_rpe, n_head, s_tile, interpret)
    return out, (q, k, v, rpe, invalid, w_rpe, b_rpe)


def _bwd(n_head, s_tile, interpret, residuals, g):
    q, k, v, rpe, invalid, w_rpe, b_rpe = residuals
    dq, dk, dv, drpe, dw, db = _knarpe_bwd_pallas(
        q, k, v, rpe, invalid, w_rpe, b_rpe, g, n_head, s_tile, interpret
    )
    return dq, dk, dv, drpe, None, dw, db


knarpe_attention.defvjp(_fwd, _bwd)


def knarpe_attention_reference(q, k, v, rpe, invalid, w_rpe, b_rpe, n_head: int):
    """Public XLA fallback with the same signature (CPU tests, non-TPU backends)."""
    return _reference(q, k, v, rpe, invalid, w_rpe, b_rpe, n_head)


# --------------------------------------------------------------------------
# v2: cross-attention over RAW (standardized) targets — fuses BOTH the kv and
# rpe projections with the attention. The XLA path materializes k+rpe_k /
# v+rpe_v [B, S, K, 2*d_model] in HBM per layer (~93 MB at flagship rollout
# shapes) and lowers the per-source logits to VPU multiply-reduce with layout
# copies around the k/v split; here the projection output never leaves VMEM.
#
#     kk|vv = tgt @ W_kv' + rpe @ W_rpe + b'      (two MXU dots per tile)
#     out   = maskedsoftmax(q.kk) . vv            (v1 attention core)
#
# LayerNorm of the targets is folded into W_kv'/b' by the caller
# (AttentionRPE._project_kv_plus_rpe semantics with ln=(gamma, beta)).
# --------------------------------------------------------------------------


def _x_fwd_kernel(q_ref, tgt_ref, rpe_ref, inv_ref, wk_ref, wr_ref, b_ref,
                  seg_ref, segT_ref, out_ref, *, n_head: int):
    _, s_tile, n_knn, d_model = tgt_ref.shape
    r = rpe_ref.shape[-1]
    scale = 1.0 / (d_model // n_head) ** 0.5

    q = q_ref[...].reshape(s_tile, d_model).astype(jnp.float32)
    tgt = tgt_ref[...].reshape(s_tile * n_knn, d_model)
    rpe = rpe_ref[...].reshape(s_tile * n_knn, r)
    inv = inv_ref[...].reshape(s_tile, n_knn).astype(jnp.float32)[:, :, None] > 0.0
    seg, segT = seg_ref[...], segT_ref[...]

    kv = (
        jnp.dot(tgt, wk_ref[...], preferred_element_type=jnp.float32)
        + jnp.dot(rpe, wr_ref[...], preferred_element_type=jnp.float32)
        + b_ref[...].astype(jnp.float32)
    )
    kk3 = kv[:, :d_model].reshape(s_tile, n_knn, d_model)
    vv3 = kv[:, d_model:].reshape(s_tile, n_knn, d_model)

    prod = q[:, None, :] * kk3
    logits = jnp.dot(
        prod.reshape(s_tile * n_knn, d_model), seg, preferred_element_type=jnp.float32
    ).reshape(s_tile, n_knn, n_head) * scale
    logits = jnp.where(inv, _MASK, logits)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    e = jnp.where(inv, 0.0, e)
    denom = jnp.sum(e, axis=1, keepdims=True)
    no_valid = denom <= 0.0
    attn = e / jnp.where(no_valid, 1.0, denom)

    attn_full = jnp.dot(
        attn.reshape(s_tile * n_knn, n_head), segT, preferred_element_type=jnp.float32
    ).reshape(s_tile, n_knn, d_model)
    out = jnp.sum(attn_full * vv3, axis=1)
    nv_full = jnp.dot(no_valid.reshape(s_tile, n_head).astype(jnp.float32), segT,
                      preferred_element_type=jnp.float32)
    out = jnp.where(nv_full > 0.0, 0.0, out)
    out_ref[...] = out.reshape(1, s_tile, d_model).astype(out_ref.dtype)


def _knarpe_x_fwd_pallas(q, tgt, rpe, invalid, w_kv, w_rpe, b, n_head: int,
                         s_tile: int = 64, interpret: bool = False):
    n_b, n_s, n_knn, d_model = tgt.shape
    r = rpe.shape[-1]
    if n_b > 1:
        out = _knarpe_x_fwd_pallas(
            q.reshape(1, n_b * n_s, d_model),
            tgt.reshape(1, n_b * n_s, n_knn, d_model),
            rpe.reshape(1, n_b * n_s, n_knn, r),
            invalid.reshape(1, n_b * n_s, n_knn),
            w_kv, w_rpe, b, n_head, s_tile, interpret,
        )
        return out.reshape(n_b, n_s, d_model)
    s_tile = _pick_s_tile(n_s, s_tile, n_knn, d_model, n_temps=8)
    grid = (n_b, pl.cdiv(n_s, s_tile))
    seg, segT = _head_segments(d_model, n_head)

    return pl.pallas_call(
        functools.partial(_x_fwd_kernel, n_head=n_head),
        out_shape=jax.ShapeDtypeStruct((n_b, n_s, d_model), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, s_tile, d_model), lambda b_, s: (b_, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn, d_model), lambda b_, s: (b_, s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn, r), lambda b_, s: (b_, s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn), lambda b_, s: (b_, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_model, 2 * d_model), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 2 * d_model), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * d_model,), lambda b_, s: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_model, n_head), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_head, d_model), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_tile, d_model), lambda b_, s: (b_, s, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, tgt, rpe, invalid, w_kv, w_rpe, b, seg, segT)


def _x_bwd_kernel(q_ref, tgt_ref, rpe_ref, inv_ref, wk_ref, wkT_ref, wr_ref, wrT_ref,
                  b_ref, seg_ref, segT_ref, g_ref,
                  dq_ref, dtgt_ref, drpe_ref, dwk_ref, dwr_ref, db_ref, *, n_head: int,
                  n_s: int):
    """Recompute-forward backward; dwk/dwr/db accumulate over the sequential
    grid. dtgt/drpe come from the kv projections' transposes."""
    _, s_tile, n_knn, d_model = tgt_ref.shape
    r = rpe_ref.shape[-1]
    scale = 1.0 / (d_model // n_head) ** 0.5

    valid_row = _row_mask(s_tile, n_s)  # [s, 1] — zero padding rows so the
    # grid-accumulated dwk/dwr/db never see unspecified block-padding data
    vrow_kd = jnp.broadcast_to(valid_row[:, None, :], (s_tile, n_knn, 1)).reshape(
        s_tile * n_knn, 1)
    q = jnp.where(valid_row, q_ref[...].reshape(s_tile, d_model).astype(jnp.float32), 0.0)
    tgt = jnp.where(vrow_kd, tgt_ref[...].reshape(s_tile * n_knn, d_model), 0)
    rpe = jnp.where(vrow_kd, rpe_ref[...].reshape(s_tile * n_knn, r), 0)
    inv = (inv_ref[...].reshape(s_tile, n_knn).astype(jnp.float32)[:, :, None] > 0.0) | ~valid_row[:, :, None]
    seg, segT = seg_ref[...], segT_ref[...]
    g = jnp.where(valid_row, g_ref[...].reshape(s_tile, d_model).astype(jnp.float32), 0.0)

    kv = (
        jnp.dot(tgt, wk_ref[...], preferred_element_type=jnp.float32)
        + jnp.dot(rpe, wr_ref[...], preferred_element_type=jnp.float32)
        + b_ref[...].astype(jnp.float32)
    )
    kk3 = kv[:, :d_model].reshape(s_tile, n_knn, d_model)
    vv3 = kv[:, d_model:].reshape(s_tile, n_knn, d_model)

    prod = q[:, None, :] * kk3
    logits = jnp.dot(
        prod.reshape(s_tile * n_knn, d_model), seg, preferred_element_type=jnp.float32
    ).reshape(s_tile, n_knn, n_head) * scale
    logits = jnp.where(inv, _MASK, logits)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    e = jnp.where(inv, 0.0, e)
    denom = jnp.sum(e, axis=1, keepdims=True)
    no_valid = denom <= 0.0
    attn = e / jnp.where(no_valid, 1.0, denom)

    attn_full = jnp.dot(
        attn.reshape(s_tile * n_knn, n_head), segT, preferred_element_type=jnp.float32
    ).reshape(s_tile, n_knn, d_model)
    g3 = g[:, None, :]

    dvv = attn_full * g3  # [s, K, D]
    dattn = jnp.dot(
        (g3 * vv3).reshape(s_tile * n_knn, d_model), seg, preferred_element_type=jnp.float32
    ).reshape(s_tile, n_knn, n_head)
    s_dot = jnp.sum(attn * dattn, axis=1, keepdims=True)
    dlogits = attn * (dattn - s_dot)
    dlogits_full = jnp.dot(
        dlogits.reshape(s_tile * n_knn, n_head), segT, preferred_element_type=jnp.float32
    ).reshape(s_tile, n_knn, d_model) * scale
    dq = jnp.sum(dlogits_full * kk3, axis=1)
    dkk = dlogits_full * q[:, None, :]

    dkv = jnp.concatenate(
        [dkk.reshape(s_tile * n_knn, d_model), dvv.reshape(s_tile * n_knn, d_model)], axis=-1
    )  # [s*K, 2D]
    dtgt = jnp.dot(dkv, wkT_ref[...].astype(jnp.float32), preferred_element_type=jnp.float32)
    drpe = jnp.dot(dkv, wrT_ref[...].astype(jnp.float32), preferred_element_type=jnp.float32)

    dq_ref[...] = dq.reshape(1, s_tile, d_model).astype(dq_ref.dtype)
    dtgt_ref[...] = dtgt.reshape(1, s_tile, n_knn, d_model).astype(dtgt_ref.dtype)
    drpe_ref[...] = drpe.reshape(1, s_tile, n_knn, r).astype(drpe_ref.dtype)

    dwk_tile = jax.lax.dot_general(
        tgt.astype(jnp.float32), dkv, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dwr_tile = jax.lax.dot_general(
        rpe.astype(jnp.float32), dkv, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db_tile = jnp.sum(dkv, axis=0, keepdims=True)

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dwk_ref[...] = jnp.zeros_like(dwk_ref)
        dwr_ref[...] = jnp.zeros_like(dwr_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dwk_ref[...] += dwk_tile
    dwr_ref[...] += dwr_tile
    db_ref[...] += db_tile


def _knarpe_x_bwd_pallas(q, tgt, rpe, invalid, w_kv, w_rpe, b, g, n_head: int,
                         s_tile: int = 64, interpret: bool = False):
    n_b, n_s, n_knn, d_model = tgt.shape
    r = rpe.shape[-1]
    if n_b > 1:
        grads = _knarpe_x_bwd_pallas(
            q.reshape(1, n_b * n_s, d_model),
            tgt.reshape(1, n_b * n_s, n_knn, d_model),
            rpe.reshape(1, n_b * n_s, n_knn, r),
            invalid.reshape(1, n_b * n_s, n_knn),
            w_kv, w_rpe, b,
            g.reshape(1, n_b * n_s, d_model),
            n_head, s_tile, interpret,
        )
        dq, dtgt, drpe, dwk, dwr, db = grads
        return (dq.reshape(q.shape), dtgt.reshape(tgt.shape), drpe.reshape(rpe.shape),
                dwk, dwr, db)
    s_tile = _pick_s_tile(n_s, s_tile, n_knn, d_model, n_temps=12)
    grid = (n_b, pl.cdiv(n_s, s_tile))
    seg, segT = _head_segments(d_model, n_head)

    out_shapes = (
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(tgt.shape, tgt.dtype),
        jax.ShapeDtypeStruct(rpe.shape, rpe.dtype),
        jax.ShapeDtypeStruct((d_model, 2 * d_model), jnp.float32),
        jax.ShapeDtypeStruct((r, 2 * d_model), jnp.float32),
        jax.ShapeDtypeStruct((1, 2 * d_model), jnp.float32),
    )
    dq, dtgt, drpe, dwk, dwr, db = pl.pallas_call(
        functools.partial(_x_bwd_kernel, n_head=n_head, n_s=n_s),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, s_tile, d_model), lambda b_, s: (b_, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn, d_model), lambda b_, s: (b_, s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn, r), lambda b_, s: (b_, s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn), lambda b_, s: (b_, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_model, 2 * d_model), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * d_model, d_model), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 2 * d_model), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * d_model, r), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * d_model,), lambda b_, s: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_model, n_head), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_head, d_model), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, d_model), lambda b_, s: (b_, s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, s_tile, d_model), lambda b_, s: (b_, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn, d_model), lambda b_, s: (b_, s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn, r), lambda b_, s: (b_, s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_model, 2 * d_model), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 2 * d_model), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * d_model), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(q, tgt, rpe, invalid, w_kv, jnp.swapaxes(w_kv, 0, 1), w_rpe,
      jnp.swapaxes(w_rpe, 0, 1), b, seg, segT, g)
    return (dq, dtgt, drpe, dwk.astype(w_kv.dtype), dwr.astype(w_rpe.dtype),
            db.reshape(-1).astype(b.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def knarpe_cross_attention(q, tgt, rpe, invalid, w_kv, w_rpe, b,
                           n_head: int, s_tile: int = 64, interpret: bool = False):
    """Fused cross-attention over raw targets: both the kv and rpe projections
    run inside the kernel (VMEM), nothing [.., K, 2*d_model] touches HBM.

    q [B,S,D], tgt [B,S,K,D] (standardized; LN scale/bias pre-folded into
    w_kv/b by the caller), rpe [B,S,K,R], invalid [B,S,K] bool,
    w_kv [D,2D], w_rpe [R,2D], b [2D]. Returns [B,S,D]."""
    return _knarpe_x_fwd_pallas(q, tgt, rpe, invalid, w_kv, w_rpe, b, n_head, s_tile, interpret)


def _x_fwd(q, tgt, rpe, invalid, w_kv, w_rpe, b, n_head, s_tile, interpret):
    out = _knarpe_x_fwd_pallas(q, tgt, rpe, invalid, w_kv, w_rpe, b, n_head, s_tile, interpret)
    return out, (q, tgt, rpe, invalid, w_kv, w_rpe, b)


def _x_bwd(n_head, s_tile, interpret, residuals, g):
    q, tgt, rpe, invalid, w_kv, w_rpe, b = residuals
    dq, dtgt, drpe, dwk, dwr, db = _knarpe_x_bwd_pallas(
        q, tgt, rpe, invalid, w_kv, w_rpe, b, g, n_head, s_tile, interpret
    )
    return dq, dtgt, drpe, None, dwk, dwr, db


knarpe_cross_attention.defvjp(_x_fwd, _x_bwd)


def knarpe_cross_attention_reference(q, tgt, rpe, invalid, w_kv, w_rpe, b, n_head: int):
    """XLA path with identical math (ground truth for tests + non-TPU backends)."""
    n_b, n_s, n_knn, d_model = tgt.shape
    kv = (tgt.reshape(-1, d_model) @ w_kv + rpe.reshape(-1, rpe.shape[-1]) @ w_rpe + b)
    kv = kv.reshape(n_b, n_s, n_knn, 2 * d_model)
    d_head = d_model // n_head
    k = kv[..., :d_model].reshape(n_b, n_s, n_knn, n_head, d_head)
    v = kv[..., d_model:].reshape(n_b, n_s, n_knn, n_head, d_head)
    out, _ = knn_attention(q.reshape(n_b, n_s, n_head, d_head), k, v, invalid)
    return out.reshape(n_b, n_s, d_model)


# --------------------------------------------------------------------------
# v3: the pallas_knn playbook applied to the cross-attention kernel
# (VERDICT r3 item 2). What changed vs v2, from the standalone microbench
# (scripts/bench_knarpe.py: XLA 3.36 ms vs v2 7.99 ms at flagship shapes —
# v2 streams inputs at 47 GB/s, i.e. it is grid-serialization-bound, not
# bandwidth-bound):
#   1. bf16 MXU dots (v2 upcast everything to f32: 4x the MXU time and 2x
#      the VMEM bytes); f32 is kept only for softmax stats and accumulation.
#   2. k/v projection halves computed SEQUENTIALLY (never a [s*K, 2D] f32
#      temp), halving peak VMEM per program...
#   3. ...which lets the source tile stay wide (s_tile 64+ instead of the
#      v2 clamp to 32) — half as many sequential grid programs, each with
#      matmuls fat enough to pipeline.
# --------------------------------------------------------------------------


def _x3_fwd_kernel(q_ref, tgt_ref, rpe_ref, inv_ref, wk_ref, wr_ref, b_ref,
                   seg_ref, segT_ref, out_ref, *, n_head: int):
    _, s_tile, n_knn, d_model = tgt_ref.shape
    r = rpe_ref.shape[-1]
    scale = 1.0 / (d_model // n_head) ** 0.5

    cdt = tgt_ref.dtype  # compute dtype of the streamed operands (bf16 in prod)
    q = q_ref[...].reshape(s_tile, d_model)
    tgt = tgt_ref[...].reshape(s_tile * n_knn, d_model)
    rpe = rpe_ref[...].reshape(s_tile * n_knn, r)
    inv = inv_ref[...].reshape(s_tile, n_knn).astype(jnp.float32)[:, :, None] > 0.0
    seg = seg_ref[...].astype(cdt)  # [D, H]
    b = b_ref[...].astype(jnp.float32)

    # k half: kk = (tgt @ Wk_k + rpe @ Wr_k + b_k), bf16 dots with f32 accum,
    # immediately consumed into the per-head logits — the f32 [s*K, D] temp
    # lives only for this half
    kk = (
        jnp.dot(tgt, wk_ref[:, :d_model], preferred_element_type=jnp.float32)
        + jnp.dot(rpe, wr_ref[:, :d_model], preferred_element_type=jnp.float32)
        + b[:d_model]
    ).astype(cdt)
    prod = q[:, None, :] * kk.reshape(s_tile, n_knn, d_model)  # [s, K, D] bf16
    logits = jnp.dot(
        prod.reshape(s_tile * n_knn, d_model), seg, preferred_element_type=jnp.float32
    ).reshape(s_tile, n_knn, n_head) * scale

    logits = jnp.where(inv, _MASK, logits)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    e = jnp.where(inv, 0.0, e)
    denom = jnp.sum(e, axis=1, keepdims=True)
    no_valid = denom <= 0.0
    # attn stays f32: Mosaic cannot shape-cast packed bf16 with a 4-wide
    # (sub-lane) minor dim, and the [.., H] tensors are small anyway
    attn = e / jnp.where(no_valid, 1.0, denom)  # [s, K, H] f32

    # v half
    vv = (
        jnp.dot(tgt, wk_ref[:, d_model:], preferred_element_type=jnp.float32)
        + jnp.dot(rpe, wr_ref[:, d_model:], preferred_element_type=jnp.float32)
        + b[d_model:]
    )  # [s*K, D] f32
    attn_full = jnp.dot(
        attn.reshape(s_tile * n_knn, n_head), segT_ref[...].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )  # [s*K, D] f32
    out = jnp.sum((attn_full * vv).reshape(s_tile, n_knn, d_model), axis=1)
    nv_full = jnp.dot(no_valid.reshape(s_tile, n_head).astype(jnp.float32),
                      segT_ref[...].astype(jnp.float32),
                      preferred_element_type=jnp.float32)
    out = jnp.where(nv_full > 0.0, 0.0, out)
    out_ref[...] = out.reshape(1, s_tile, d_model).astype(out_ref.dtype)


def _knarpe_x3_fwd_pallas(q, tgt, rpe, invalid, w_kv, w_rpe, b, n_head: int,
                          s_tile: int = 128, interpret: bool = False):
    n_b, n_s, n_knn, d_model = tgt.shape
    r = rpe.shape[-1]
    if n_b > 1:
        out = _knarpe_x3_fwd_pallas(
            q.reshape(1, n_b * n_s, d_model),
            tgt.reshape(1, n_b * n_s, n_knn, d_model),
            rpe.reshape(1, n_b * n_s, n_knn, r),
            invalid.reshape(1, n_b * n_s, n_knn),
            w_kv, w_rpe, b, n_head, s_tile, interpret,
        )
        return out.reshape(n_b, n_s, d_model)
    # temps: ~5 live [s, K, D]-equivalent f32 units (kk/prod bf16 = 1, vv +
    # attn_full + out product f32 = 3, inputs bf16 = 1) + double-buffering
    s_tile = _pick_s_tile(n_s, s_tile, n_knn, d_model, n_temps=6)
    grid = (n_b, pl.cdiv(n_s, s_tile))
    seg, segT = _head_segments(d_model, n_head)

    return pl.pallas_call(
        functools.partial(_x3_fwd_kernel, n_head=n_head),
        out_shape=jax.ShapeDtypeStruct((n_b, n_s, d_model), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, s_tile, d_model), lambda b_, s: (b_, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn, d_model), lambda b_, s: (b_, s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn, r), lambda b_, s: (b_, s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, n_knn), lambda b_, s: (b_, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_model, 2 * d_model), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 2 * d_model), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * d_model,), lambda b_, s: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_model, n_head), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_head, d_model), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_tile, d_model), lambda b_, s: (b_, s, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, tgt, rpe, invalid, w_kv, w_rpe, b, seg, segT)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def knarpe_cross_attention_v3(q, tgt, rpe, invalid, w_kv, w_rpe, b,
                              n_head: int, s_tile: int = 128, interpret: bool = False):
    """v3 fused cross-attention (bf16 MXU, sequential k/v halves, wide tiles).

    Same contract as knarpe_cross_attention; numerics differ from the XLA
    path only by bf16 rounding of the streamed operands (the XLA production
    path computes in bf16 too). Backward reuses the v2 recompute kernel."""
    return _knarpe_x3_fwd_pallas(q, tgt, rpe, invalid, w_kv, w_rpe, b, n_head, s_tile, interpret)


def _x3_fwd(q, tgt, rpe, invalid, w_kv, w_rpe, b, n_head, s_tile, interpret):
    out = _knarpe_x3_fwd_pallas(q, tgt, rpe, invalid, w_kv, w_rpe, b, n_head, s_tile, interpret)
    return out, (q, tgt, rpe, invalid, w_kv, w_rpe, b)


def _x3_bwd(n_head, s_tile, interpret, residuals, g):
    q, tgt, rpe, invalid, w_kv, w_rpe, b = residuals
    dq, dtgt, drpe, dwk, dwr, db = _knarpe_x_bwd_pallas(
        q, tgt, rpe, invalid, w_kv, w_rpe, b, g, n_head, min(s_tile, 64), interpret
    )
    return dq, dtgt, drpe, None, dwk, dwr, db


knarpe_cross_attention_v3.defvjp(_x3_fwd, _x3_bwd)
