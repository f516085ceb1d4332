"""KNARPE attention module and pre-LN transformer blocks.

Parity targets: /root/reference/src/models/modules/attention_rpe.py (AttentionRPE)
and transformer_rpe.py (TransformerRPE / TransformerBlockRPE with modes
enc_self_attn / enc_cross_attn / dec_cross_attn).

Design differences from the torch version, both TPU-motivated:
  - targets given as indices are gathered explicitly per layer via
    ops.rpe.gather_tgt (the reference's int64-dtype dispatch);
  - the core attention math lives in ops.attention / ops.pallas_knarpe so the
    module can swap in the fused Pallas kernel without touching parameters.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from trafficbotsv15_tpu.ops.attention import dense_attention, knn_attention
from trafficbotsv15_tpu.ops.rpe import gather_tgt

_xavier = nn.initializers.xavier_uniform()


def standardize(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm without scale/bias (flax numerics: stats in fp32).

    eps defaults to 1e-5 — torch's nn.LayerNorm default, NOT flax's 1e-6 —
    so the stack is numerically parity-exact with the reference (the 1e-6 vs
    1e-5 gap compounds to ~2e-3 through 8 pre-LN residual layers; caught by
    tests/test_model_parity.py). Every nn.LayerNorm in models/ pins
    epsilon=1e-5 for the same reason.

    Per-layer LayerNorms of a shared target tensor differ only by their
    scale/bias, which fold into the downstream projection weights
    (LN_i(x) @ W == x_hat @ (gamma_i * W) + beta_i @ W, and gamma_i * W is
    loop-invariant so XLA hoists it out of the rollout scan). The expensive
    [.., K, d] normalization then runs ONCE per step instead of once per
    layer."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - jnp.square(mu)
    return (x32 - mu) * jax.lax.rsqrt(var + eps)


# trace-time A/B overrides live in ops/flags.py (the single env read point);
# the config defaults (TransformerCfg.seg_attn / .dense_knn_max) stay here.
# dense_knn_max: KNN self-attention over token sets up to this size runs as
# dense masked attention (zero gathers); the per-layer KV gathers this removes
# cost ~12 ms/step at flagship rollout shapes.
from trafficbotsv15_tpu.ops.flags import dense_knn_max as _dense_knn_max
from trafficbotsv15_tpu.ops.flags import seg_attn as _seg_attn


class AttentionRPE(nn.Module):
    """Fused multi-head attention with three K/V layouts (dense / KNN / KNN+RPE).

    use_pallas routes the KNN+RPE layout through the fused Pallas kernel
    (ops.pallas_knarpe) which keeps the rpe projection in VMEM; the XLA path
    is the reference fallback and the source of gradients either way."""

    d_model: int
    n_head: int
    dropout_p: float = 0.1
    bias: bool = True
    d_rpe: int = -1
    apply_q_rpe: bool = False
    use_pallas: bool = False
    attn_dropout_weights: bool = False  # drop attention weights (reference) vs output input
    seg_attn: bool = True
    dense_knn_max: int = 128
    dtype: jnp.dtype = jnp.float32

    def _dense_knn_attention(self, q, kv, tgt_idx, tgt_padding_mask, rpe, rpe_kv_static,
                             attn_drop_fn=None):
        """KNN self-attention computed as dense masked attention (no gathers).

        q:   [n_b, n_src, n_head, d_head]
        kv:  [n_b, n_tgt, 2*d_model]   (projected token set; n_tgt == n_src)
        tgt_idx: [n_b, n_src, K] int   (distinct positions per source)
        tgt_padding_mask: [n_b, n_src, K] bool, True = invalid slot

        logits over all targets = q·k + scatter(q·rpe_k at idx); the softmax is
        masked to targets appearing in a valid KNN slot; out = attn @ v plus the
        rpe_v term re-gathered from dense attn via the same one-hot. Exact
        (up to float reorder) vs gather-based knn_attention because top_k
        yields distinct positions.
        """
        n_b, n_src, n_head, d_head = q.shape
        n_tgt = kv.shape[1]
        n_knn = tgt_idx.shape[-1]
        k, v = jnp.split(kv, 2, axis=-1)
        k = k.reshape(n_b, n_tgt, n_head, d_head)
        v = v.reshape(n_b, n_tgt, n_head, d_head)
        scale = 1.0 / jnp.sqrt(jnp.asarray(d_head, q.dtype))

        onehot = (tgt_idx[..., None] == jnp.arange(n_tgt)[None, None, None]).astype(q.dtype)
        if tgt_padding_mask is not None:
            valid_slot = (~tgt_padding_mask).astype(q.dtype)
            dense_invalid = jnp.einsum("bsk,bskn->bsn", valid_slot, onehot) <= 0.0
        else:
            dense_invalid = jnp.einsum("bskn->bsn", onehot) <= 0.0

        logits = jnp.einsum("bshd,bthd->bsht", q, k) * scale  # [b, s, h, t]
        fullwidth_rpe = rpe_kv_static is not None and rpe_kv_static[0].ndim == 4
        if rpe_kv_static is not None:
            rpe_k, rpe_v = rpe_kv_static  # head-split [b,s,K,h,dh] or fullwidth [b,s,K,D]
        elif rpe is not None:
            assert self.d_rpe > 0
            if _seg_attn(self.seg_attn):
                # fullwidth rpe projection: the per-head q·rpe_k reduction runs
                # as a head-segment matmul (MXU) instead of a transposed VPU
                # multiply-reduce — same cure as knn_attention_fullwidth
                rpe_proj = self._rpe_kv_fullwidth(rpe)
                rpe_k, rpe_v = rpe_proj
                fullwidth_rpe = True
            else:
                rpe_k, rpe_v = self._rpe_kv(rpe)  # [b, s, K, h, dh]
        else:
            rpe_k = rpe_v = None
        if rpe_k is not None:
            if fullwidth_rpe:
                from trafficbotsv15_tpu.ops.attention import head_segments

                seg = head_segments(self.d_model, n_head, q.dtype)
                q_full = q.reshape(n_b, n_src, self.d_model)
                q_rpe = jnp.einsum(
                    "bskd,dh->bskh", q_full[:, :, None, :] * rpe_k, seg) * scale
            else:
                q_rpe = jnp.einsum("bshd,bskhd->bskh", q, rpe_k) * scale
            logits = logits + jnp.einsum("bskh,bskn->bshn", q_rpe, onehot)

        from trafficbotsv15_tpu.ops.attention import _masked_softmax

        attn, no_valid = _masked_softmax(logits, dense_invalid[:, :, None, :])
        if attn_drop_fn is not None:
            attn = attn_drop_fn(attn)
        out = jnp.einsum("bsht,bthd->bshd", attn, v)
        if rpe_v is not None:
            attn_knn = jnp.einsum("bshn,bskn->bskh", attn, onehot)
            if fullwidth_rpe:
                attn_full = jnp.einsum("bskh,hd->bskd", attn_knn.astype(q.dtype), seg.T)
                out = out + jnp.sum(attn_full * rpe_v, axis=2).reshape(
                    n_b, n_src, n_head, d_head)
            else:
                out = out + jnp.einsum("bskh,bskhd->bshd", attn_knn, rpe_v)
        if no_valid is not None:
            out = jnp.where(no_valid[..., 0][..., None, None], 0.0, out)
        return out.reshape(n_b, n_src, n_head * d_head)

    def _rpe_kv_fullwidth(self, rpe):
        """rpe -> (rpe_k, rpe_v) kept full-width [..., d_model] (no head split)."""
        w_rpe, b_rpe = self._rpe_wb()
        rpe_proj = checkpoint_name(
            rpe.astype(self.dtype) @ w_rpe.astype(self.dtype) + b_rpe.astype(self.dtype),
            "kv_proj")
        return jnp.split(rpe_proj, 2, axis=-1)

    def _kv_wb(self):
        w = self.param("kv_w", _xavier, (self.d_model, 2 * self.d_model), jnp.float32)
        b = None
        if self.bias:
            b = self.param("kv_b", nn.initializers.zeros, (2 * self.d_model,), jnp.float32)
        return w, b

    def _rpe_wb(self):
        w = self.param("rpe_proj_w", _xavier, (self.d_rpe, 2 * self.d_model), jnp.float32)
        b = self.param("rpe_proj_b", nn.initializers.zeros, (2 * self.d_model,), jnp.float32)
        return w, b

    def _project_kv(self, x, ln=None):
        """x @ W_kv + b -> [..., 2*d_model] (the nn.Dense kv projection, as
        explicit params so it can be concat-fused with the rpe projection).

        With ln=(gamma, beta), x must be pre-standardized (see standardize):
        the LayerNorm scale/bias fold into the weights — loop-invariant, so
        the fold itself is hoisted out of the rollout scan by XLA."""
        w, b = self._kv_wb()
        if ln is not None:
            gamma, beta = ln
            b = beta @ w if b is None else b + beta @ w  # beta folds via the ORIGINAL W
            w = gamma[:, None] * w
        y = x.astype(self.dtype) @ w.astype(self.dtype)
        return checkpoint_name(y if b is None else y + b.astype(self.dtype), "kv_proj")

    def _project_kv_plus_rpe(self, tgt, rpe, ln=None, split_heads=True):
        """(k + rpe_k, v + rpe_v) as ONE matmul over concatenated features:
        tgt @ W_kv + rpe @ W_rpe == [tgt ⊕ rpe] @ [W_kv; W_rpe]. Halves the
        large [.., K, 2*d_model] output traffic of the per-step cross-attn
        (two matmuls + slice_add -> one matmul) — the adds were ~3 ms/step at
        flagship rollout shapes. With ln=(gamma, beta), tgt must be
        pre-standardized and the per-layer LayerNorm folds into W_kv (the
        [.., K, d] normalization then runs once per step, not once per layer).
        Returns (k, v) with rpe folded in, each [..., n_head, d_head]."""
        wk, bk = self._kv_wb()
        wr, br = self._rpe_wb()
        if ln is not None:
            gamma, beta = ln
            bk = beta @ wk if bk is None else bk + beta @ wk  # beta folds via the ORIGINAL W
            wk = gamma[:, None] * wk
        cat = jnp.concatenate([tgt.astype(self.dtype), rpe.astype(self.dtype)], axis=-1)
        w = jnp.concatenate([wk, wr], axis=0).astype(self.dtype)
        b = br if bk is None else bk + br
        # tagged for remat_policy="names+kv": saving the projected K/V lets the
        # BPTT replay skip the largest per-step matmuls, at [.., K, 2D] HBM/step
        y = checkpoint_name(cat @ w + b.astype(self.dtype), "kv_proj")
        k, v = jnp.split(y, 2, axis=-1)
        if not split_heads:
            return k, v  # full-width [.., K, d_model] halves
        shape = tgt.shape[:-1] + (self.n_head, self.d_model // self.n_head)
        return k.reshape(shape), v.reshape(shape)

    def _rpe_kv(self, rpe):
        """Project rpe -> (rpe_k, rpe_v), each [..., n_head, d_head]."""
        d_head = self.d_model // self.n_head
        w_rpe, b_rpe = self._rpe_wb()
        rpe_proj = rpe.astype(self.dtype) @ w_rpe.astype(self.dtype) + b_rpe.astype(self.dtype)
        rpe_k, rpe_v = jnp.split(rpe_proj, 2, axis=-1)
        shape = rpe.shape[:-1] + (self.n_head, d_head)
        return rpe_k.reshape(shape), rpe_v.reshape(shape)

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,  # [n_b, n_src, d_model]
        tgt: Optional[jnp.ndarray] = None,  # None (self), [n_b, n_tgt, d] (dense) or [n_b, n_src, K, d] (knn)
        tgt_padding_mask: Optional[jnp.ndarray] = None,  # bool, True = invalid
        rpe: Optional[jnp.ndarray] = None,  # [n_b, n_src, K, d_rpe]
        deterministic: bool = True,
        kv_static=None,  # ((k+rpe_k, v+rpe_v)) from compute_static_kv: skip k/v+rpe projections
        rpe_kv_static=None,  # (rpe_k, rpe_v) precomputed: skip the rpe projection only
        compute_static_kv: bool = False,
        tgt_idx: Optional[jnp.ndarray] = None,  # [n_b, n_src, K] self-attn KNN: project src then gather
        tgt_ln=None,  # (gamma, beta): tgt arrives standardize()d; LN folds into W_kv
    ):
        d_head = self.d_model // self.n_head
        assert d_head * self.n_head == self.d_model

        if compute_static_kv:
            # scenario-static K/V hoist: project the (static) targets and rpe once
            # outside the rollout scan; per-step attention then reuses them.
            if tgt is None:
                # rpe-only precompute (dynamic K/V, static rpe); fullwidth when
                # the consumer uses the head-segment matmul formulation
                assert rpe is not None and self.d_rpe > 0 and not self.apply_q_rpe
                if _seg_attn(self.seg_attn):
                    return tuple(self._rpe_kv_fullwidth(rpe))
                return self._rpe_kv(rpe)
            assert tgt.ndim == 4
            split = not _seg_attn(self.seg_attn)  # fullwidth storage when the consumer is
            # knn_attention_fullwidth (head-segment matmul path)
            if rpe is not None:
                assert self.d_rpe > 0 and not self.apply_q_rpe
                return self._project_kv_plus_rpe(tgt, rpe, ln=tgt_ln, split_heads=split)
            k, v = jnp.split(self._project_kv(tgt, ln=tgt_ln), 2, axis=-1)
            if not split:
                return k, v
            shape = tgt.shape[:-1] + (self.n_head, d_head)
            return k.reshape(shape), v.reshape(shape)

        n_b, n_src, _ = src.shape
        dense_q = nn.Dense(self.d_model, use_bias=self.bias, kernel_init=_xavier, dtype=self.dtype, name="q_proj")
        q = dense_q(src)
        q = q.reshape(n_b, n_src, self.n_head, d_head)

        # reference-parity option: dropout on the softmaxed attention WEIGHTS
        # (attention_rpe.py:168) instead of the output-projection input
        wdrop = None
        if self.dropout_p > 0 and self.attn_dropout_weights:
            wdrop_mod = nn.Dropout(self.dropout_p, deterministic=deterministic, name="attn_wdrop")
            wdrop = lambda a: wdrop_mod(a)

        if kv_static is not None:
            if kv_static[0].ndim == 4:  # fullwidth [b, s, K, d_model] halves
                from trafficbotsv15_tpu.ops.attention import knn_attention_fullwidth

                out = knn_attention_fullwidth(
                    q.reshape(n_b, n_src, self.d_model),
                    kv_static[0], kv_static[1], tgt_padding_mask, self.n_head,
                    attn_drop_fn=wdrop)
            else:
                out, _ = knn_attention(q, kv_static[0], kv_static[1], tgt_padding_mask,
                                       attn_drop_fn=wdrop)
            if self.dropout_p > 0 and not self.attn_dropout_weights:
                out = nn.Dropout(self.dropout_p, deterministic=deterministic, name="attn_drop")(out)
            out = nn.Dense(self.d_model, use_bias=self.bias, kernel_init=_xavier, dtype=self.dtype, name="out_proj")(out)
            if tgt_padding_mask is not None:
                no_valid = jnp.all(tgt_padding_mask, axis=-1)
                out = jnp.where(no_valid[..., None], 0.0, out)
            return out

        dense_knn = tgt_idx is not None and not self.apply_q_rpe and n_src <= _dense_knn_max(self.dense_knn_max)
        fused_kv_rpe = (  # cross-attn over per-source RAW KNN targets with rpe:
            # fold the rpe projection into the kv matmul (one concat matmul on
            # XLA; the fully-fused v2 Pallas kernel when use_pallas)
            tgt is not None and tgt.ndim == 4 and rpe is not None
            and rpe_kv_static is None and not self.apply_q_rpe
        )
        if tgt_idx is not None and not dense_knn:
            # KNN self-attention: project the n_src tokens once, THEN gather —
            # row-wise ops commute with the gather, so this is bit-identical to
            # gather-then-project but runs the matmul on K x fewer rows
            assert tgt is None
            kv = gather_tgt(self._project_kv(src), tgt_idx)  # [n_b, n_src, K, 2d]
            tgt = kv  # mark the KNN (4D) layout for the branch below
        elif not dense_knn and not fused_kv_rpe:
            kv = self._project_kv(src if tgt is None else tgt,
                                  ln=tgt_ln if tgt is not None else None)
        if not dense_knn and not fused_kv_rpe:
            k, v = jnp.split(kv, 2, axis=-1)

        if dense_knn:
            # KNN self-attention over a small token set: run DENSE attention
            # with a mask built from the indices. Equivalent math (top_k gives
            # distinct positions, so each target owns at most one KNN slot and
            # the scattered rpe biases are exact), but zero HBM gathers — the
            # per-layer [n_b*n_src*K, 2d] KV gathers were the rollout's second
            # biggest cost after the bool-mask gathers.
            assert tgt is None
            out = self._dense_knn_attention(
                q, self._project_kv(src), tgt_idx, tgt_padding_mask, rpe, rpe_kv_static,
                attn_drop_fn=wdrop,
            )
        elif tgt is None or tgt.ndim == 3:
            # dense attention over a shared target set
            n_tgt = n_src if tgt is None else tgt.shape[1]
            k = k.reshape(n_b, n_tgt, self.n_head, d_head)
            v = v.reshape(n_b, n_tgt, self.n_head, d_head)
            invalid = tgt_padding_mask
            if invalid is not None and invalid.ndim == 2:
                invalid = jnp.broadcast_to(invalid[:, None, :], (n_b, n_src, n_tgt))
            out, _ = dense_attention(q, k, v, invalid, attn_drop_fn=wdrop)
        else:
            # per-source KNN targets [n_b, n_src, K, d]
            n_knn = tgt.shape[2]
            from trafficbotsv15_tpu.ops.pallas_knarpe import (
                knarpe_attention,
                knarpe_attention_reference,
                pallas_available,
            )

            if (rpe is not None and not self.apply_q_rpe and not fused_kv_rpe
                    and self.use_pallas and pallas_available()
                    and not self.attn_dropout_weights):
                # v1 kernel: k/v already projected (tgt_idx project-then-gather
                # path); fuses the rpe projection + attention
                assert self.d_rpe > 0
                w_rpe, b_rpe = self._rpe_wb()
                inv = tgt_padding_mask
                if inv is None:
                    inv = jnp.zeros((n_b, n_src, n_knn), bool)
                n_head = self.n_head
                # platform_dependent: Mosaic kernel on TPU, identical-math XLA
                # everywhere else (CPU param-init trace, virtual-mesh tests)
                out = jax.lax.platform_dependent(
                    q.reshape(n_b, n_src, self.d_model), k, v, rpe.astype(self.dtype), inv,
                    w_rpe.astype(self.dtype), b_rpe.astype(self.dtype),
                    tpu=lambda *a: knarpe_attention(*a, n_head),
                    default=lambda *a: knarpe_attention_reference(*a, n_head).reshape(
                        n_b, n_src, self.d_model
                    ),
                )
            elif fused_kv_rpe:
                if self.use_pallas and pallas_available() and not self.attn_dropout_weights:
                    # v2 kernel: kv + rpe projections AND the attention fused
                    # in VMEM — the [.., K, 2*d_model] projection output never
                    # touches HBM. LN scale/bias pre-folded into the weights.
                    from trafficbotsv15_tpu.ops.pallas_knarpe import (
                        knarpe_cross_attention,
                        knarpe_cross_attention_reference,
                    )

                    wk, bk = self._kv_wb()
                    wr, br = self._rpe_wb()
                    if tgt_ln is not None:
                        gamma, beta = tgt_ln
                        bk = beta @ wk if bk is None else bk + beta @ wk
                        wk = gamma[:, None] * wk
                    b_all = (br if bk is None else bk + br).astype(self.dtype)
                    inv = tgt_padding_mask
                    if inv is None:
                        inv = jnp.zeros((n_b, n_src, n_knn), bool)
                    args = (
                        q.reshape(n_b, n_src, self.d_model), tgt.astype(self.dtype),
                        rpe.astype(self.dtype), inv,
                        wk.astype(self.dtype), wr.astype(self.dtype), b_all,
                    )
                    out = jax.lax.platform_dependent(
                        *args,
                        tpu=lambda *a: knarpe_cross_attention(*a, self.n_head),
                        default=lambda *a: knarpe_cross_attention_reference(*a, self.n_head),
                    )
                elif _seg_attn(self.seg_attn):
                    # head-segment matmul attention on the full-width halves:
                    # no head split, no layout copies, q.k rides the MXU
                    from trafficbotsv15_tpu.ops.attention import knn_attention_fullwidth

                    kf, vf = self._project_kv_plus_rpe(tgt, rpe, ln=tgt_ln, split_heads=False)
                    out = knn_attention_fullwidth(
                        q.reshape(n_b, n_src, self.d_model), kf, vf,
                        tgt_padding_mask, self.n_head, attn_drop_fn=wdrop,
                    )
                else:
                    # one concat matmul produces k+rpe_k / v+rpe_v directly
                    k, v = self._project_kv_plus_rpe(tgt, rpe, ln=tgt_ln)
                    out, _ = knn_attention(q, k, v, tgt_padding_mask, attn_drop_fn=wdrop)
            elif rpe is None and rpe_kv_static is None and _seg_attn(self.seg_attn):
                # no-rpe KNN cross attention (scene-centric mode): same
                # head-segment matmul formulation, no head split
                from trafficbotsv15_tpu.ops.attention import knn_attention_fullwidth

                out = knn_attention_fullwidth(
                    q.reshape(n_b, n_src, self.d_model), k, v,
                    tgt_padding_mask, self.n_head, attn_drop_fn=wdrop,
                )
            else:
                k = k.reshape(n_b, n_src, n_knn, self.n_head, d_head)
                v = v.reshape(n_b, n_src, n_knn, self.n_head, d_head)
                rpe_q = rpe_k = rpe_v = None
                if rpe_kv_static is not None:
                    rpe_k, rpe_v = rpe_kv_static
                    if rpe_k.ndim == 4:  # fullwidth static cache: head-split here
                        shp = rpe_k.shape[:-1] + (self.n_head, d_head)
                        rpe_k, rpe_v = rpe_k.reshape(shp), rpe_v.reshape(shp)
                elif rpe is not None:
                    assert self.d_rpe > 0
                    if self.apply_q_rpe:
                        rpe_proj = nn.Dense(
                            3 * self.d_model, use_bias=self.bias, kernel_init=_xavier,
                            dtype=self.dtype, name="rpe_proj",
                        )(rpe.astype(self.dtype))
                        parts = jnp.split(rpe_proj, 3, axis=-1)
                        rpe_q = parts[0].reshape(n_b, n_src, n_knn, self.n_head, d_head)
                        rpe_k = parts[1].reshape(n_b, n_src, n_knn, self.n_head, d_head)
                        rpe_v = parts[2].reshape(n_b, n_src, n_knn, self.n_head, d_head)
                    else:
                        rpe_k, rpe_v = self._rpe_kv(rpe)
                out, _ = knn_attention(q, k, v, tgt_padding_mask, rpe_k=rpe_k, rpe_v=rpe_v, rpe_q=rpe_q,
                                       attn_drop_fn=wdrop)

        if self.dropout_p > 0 and not self.attn_dropout_weights:
            # default: applied to the output-projection input; the reference drops
            # attention weights — statistically equivalent regularization, cheaper
            # on TPU. attn_dropout_weights=True restores the reference placement.
            out = nn.Dropout(self.dropout_p, deterministic=deterministic, name="attn_drop")(out)
        out = nn.Dense(self.d_model, use_bias=self.bias, kernel_init=_xavier, dtype=self.dtype, name="out_proj")(out)

        if tgt_padding_mask is not None:
            no_valid = jnp.all(tgt_padding_mask, axis=-1)
            if no_valid.ndim == 1:  # dense 2D padding mask: per-batch
                no_valid = jnp.broadcast_to(no_valid[:, None], (n_b, n_src))
            out = jnp.where(no_valid[..., None], 0.0, out)
        return out


class TransformerLayer(nn.Module):
    """Pre-LN residual layer: (optional decoder self-attn) + attn + FFN."""

    d_model: int
    n_head: int
    k_feedforward: int = 4
    dropout_p: float = 0.1
    bias: bool = True
    activation: str = "relu"
    mode: str = "enc_self_attn"  # enc_self_attn | enc_cross_attn | dec_cross_attn
    d_rpe: int = -1
    apply_q_rpe: bool = False
    use_pallas: bool = False
    attn_dropout_weights: bool = False
    seg_attn: bool = True
    dense_knn_max: int = 128
    dtype: jnp.dtype = jnp.float32

    def _norm_tgt_params(self):
        """LayerNorm scale/bias for the cross-attn targets, as explicit params
        (folded into the kv projection; see standardize)."""
        gamma = self.param("norm_tgt_scale", nn.initializers.ones, (self.d_model,), jnp.float32)
        beta = self.param("norm_tgt_bias", nn.initializers.zeros, (self.d_model,), jnp.float32)
        return gamma, beta

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,
        src_padding_mask: Optional[jnp.ndarray] = None,
        tgt: Optional[jnp.ndarray] = None,
        tgt_padding_mask: Optional[jnp.ndarray] = None,
        rpe: Optional[jnp.ndarray] = None,
        decoder_tgt: Optional[jnp.ndarray] = None,
        decoder_tgt_padding_mask: Optional[jnp.ndarray] = None,
        decoder_rpe: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        cross_kv_static=None,  # (k+rpe_k, v+rpe_v) for the cross-attn (static targets)
        decoder_rpe_kv_static=None,  # (rpe_k, rpe_v) for the decoder self-attn
        compute_static_kv: bool = False,
        tgt_idx: Optional[jnp.ndarray] = None,  # KNN self-attn: project-then-gather
        decoder_tgt_idx: Optional[jnp.ndarray] = None,
        tgt_standardized: bool = False,  # tgt already standardize()d by the Block
    ):
        act = {"relu": nn.relu, "gelu": nn.gelu, "elu": nn.elu}[self.activation]
        attn_kw = dict(
            d_model=self.d_model,
            n_head=self.n_head,
            dropout_p=self.dropout_p,
            bias=self.bias,
            d_rpe=self.d_rpe,
            apply_q_rpe=self.apply_q_rpe,
            use_pallas=self.use_pallas,
            attn_dropout_weights=self.attn_dropout_weights,
            seg_attn=self.seg_attn,
            dense_knn_max=self.dense_knn_max,
            dtype=self.dtype,
        )
        drop = lambda name: nn.Dropout(self.dropout_p, deterministic=deterministic, name=name)

        if compute_static_kv:
            # hoist the scenario-static projections out of the rollout scan:
            # cross-attn K/V(+rpe) of static targets, decoder self-attn rpe_k/v
            cross_kv = None
            if tgt is not None:
                cross_kv = AttentionRPE(**attn_kw, name="attn")(
                    None, standardize(tgt), rpe=rpe, compute_static_kv=True,
                    tgt_ln=self._norm_tgt_params(),
                )
            dec_rpe_kv = None
            if self.mode == "dec_cross_attn" and decoder_rpe is not None:
                dec_rpe_kv = AttentionRPE(**attn_kw, name="attn_src")(
                    None, None, rpe=decoder_rpe, compute_static_kv=True
                )
            return cross_kv, dec_rpe_kv

        if self.mode == "dec_cross_attn":
            norm_src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_src")
            s = norm_src(src)
            d_tgt = decoder_tgt
            d_mask = decoder_tgt_padding_mask
            if d_tgt is None and decoder_tgt_idx is None:
                d_mask = src_padding_mask
            elif d_tgt is not None:
                # LN is row-wise so norm(gathered) == gather(normed); the idx
                # path below exploits the same commutation for the projection
                d_tgt = norm_src(d_tgt)
            s = AttentionRPE(**attn_kw, name="attn_src")(
                s, d_tgt, tgt_padding_mask=d_mask, rpe=decoder_rpe, deterministic=deterministic,
                rpe_kv_static=decoder_rpe_kv_static, tgt_idx=decoder_tgt_idx,
            )
            if self.dropout_p > 0:
                s = drop("drop_src")(s)
            src = src + checkpoint_name(s, "sublayer_out")

        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        src2 = norm1(src)
        t, t_ln = tgt, None
        if cross_kv_static is not None:
            t = None
        elif t is None and tgt_idx is None:
            tgt_padding_mask = src_padding_mask if tgt_padding_mask is None else tgt_padding_mask
        elif t is not None:
            if self.mode == "enc_self_attn":
                t = norm1(t)
            elif t.ndim == 4:
                # KNN cross targets: the LayerNorm scale/bias fold into the kv
                # projection; the tensor itself is standardize()d ONCE (by the
                # Block, shared across layers) instead of LayerNormed per layer
                if not tgt_standardized:
                    t = standardize(t)
                t_ln = self._norm_tgt_params()
            else:
                t = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_tgt")(t)
        src2 = AttentionRPE(**attn_kw, name="attn")(
            src2, t, tgt_padding_mask=tgt_padding_mask, rpe=rpe, deterministic=deterministic,
            kv_static=cross_kv_static, tgt_idx=tgt_idx, tgt_ln=t_ln,
        )
        if self.dropout_p > 0:
            src2 = drop("drop1")(src2)
        src = src + checkpoint_name(src2, "sublayer_out")

        src2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src)
        src2 = act(nn.Dense(self.k_feedforward * self.d_model, use_bias=self.bias, dtype=self.dtype, name="ffn1")(src2))
        if self.dropout_p > 0:
            src2 = drop("drop_ffn")(src2)
        src2 = nn.Dense(self.d_model, use_bias=self.bias, dtype=self.dtype, name="ffn2")(src2)
        if self.dropout_p > 0:
            src2 = drop("drop2")(src2)
        # tagged for remat_policy="names": saving each sub-layer output makes
        # the BPTT replay per-layer-local (and skips dropout threefry replay)
        src = src + checkpoint_name(src2, "sublayer_out")

        if src_padding_mask is not None:
            src = jnp.where(src_padding_mask[..., None], 0.0, src)
        return src


class TransformerBlock(nn.Module):
    """Stack of TransformerLayers; int-index targets are re-gathered from the
    evolving src each layer (transformer_rpe.py:82-131)."""

    d_model: int
    n_head: int = 4
    k_feedforward: int = 4
    dropout_p: float = 0.1
    bias: bool = True
    activation: str = "relu"
    out_layernorm: bool = False
    apply_q_rpe: bool = False
    use_pallas: bool = False
    attn_dropout_weights: bool = False
    seg_attn: bool = True
    dense_knn_max: int = 128
    n_layer: int = 1
    mode: str = "enc_self_attn"
    d_rpe: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,
        src_padding_mask: Optional[jnp.ndarray] = None,
        tgt: Optional[jnp.ndarray] = None,  # features [n_b, (n_src), n_tgt, d] or None
        tgt_idx: Optional[jnp.ndarray] = None,  # int [n_b, n_src, K]: gather from src (self-attn KNN)
        tgt_padding_mask: Optional[jnp.ndarray] = None,
        rpe: Optional[jnp.ndarray] = None,
        decoder_tgt_idx: Optional[jnp.ndarray] = None,  # int [n_b, n_src, K]: decoder self-attn KNN
        decoder_tgt_padding_mask: Optional[jnp.ndarray] = None,
        decoder_rpe: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        static_kv=None,  # per-layer [(cross_kv, dec_rpe_kv)] from compute_static_kv
        compute_static_kv: bool = False,
    ):
        assert self.mode in ("enc_self_attn", "enc_cross_attn", "dec_cross_attn")
        if compute_static_kv:
            # per-layer scenario-static projections (cross-attn K/V of static
            # targets + decoder self-attn rpe_k/v); reused every rollout step
            caches = []
            for i in range(self.n_layer):
                caches.append(TransformerLayer(
                    d_model=self.d_model, n_head=self.n_head, k_feedforward=self.k_feedforward,
                    dropout_p=self.dropout_p, bias=self.bias, activation=self.activation,
                    mode=self.mode, d_rpe=self.d_rpe, apply_q_rpe=self.apply_q_rpe,
                    use_pallas=self.use_pallas, dtype=self.dtype, name=f"layer{i}",
                    attn_dropout_weights=self.attn_dropout_weights,
                    seg_attn=self.seg_attn, dense_knn_max=self.dense_knn_max,
                )(None, tgt=tgt, rpe=rpe, decoder_rpe=decoder_rpe, compute_static_kv=True))
            return caches
        if tgt is not None and tgt.ndim == 4 and self.mode != "enc_self_attn":
            # standardize the KNN cross targets ONCE; per-layer LayerNorms
            # differ only by scale/bias, which fold into the kv projections.
            # cast to the compute dtype here: the f32 standardize output would
            # otherwise be re-read at twice the bytes by every layer
            tgt = standardize(tgt).astype(self.dtype)
            tgt_standardized = True
        else:
            tgt_standardized = False
        for i in range(self.n_layer):
            _ckv, _drkv = static_kv[i] if static_kv is not None else (None, None)
            src = TransformerLayer(
                d_model=self.d_model,
                n_head=self.n_head,
                k_feedforward=self.k_feedforward,
                dropout_p=self.dropout_p,
                bias=self.bias,
                activation=self.activation,
                mode=self.mode,
                d_rpe=self.d_rpe,
                apply_q_rpe=self.apply_q_rpe,
                use_pallas=self.use_pallas,
                attn_dropout_weights=self.attn_dropout_weights,
                seg_attn=self.seg_attn,
                dense_knn_max=self.dense_knn_max,
                dtype=self.dtype,
                name=f"layer{i}",
            )(
                src,
                src_padding_mask=src_padding_mask,
                tgt=tgt,
                tgt_padding_mask=tgt_padding_mask,
                rpe=rpe,
                decoder_tgt_padding_mask=decoder_tgt_padding_mask,
                decoder_rpe=decoder_rpe,
                deterministic=deterministic,
                cross_kv_static=_ckv,
                decoder_rpe_kv_static=_drkv,
                tgt_idx=tgt_idx,
                decoder_tgt_idx=decoder_tgt_idx,
                tgt_standardized=tgt_standardized,
            )
        if self.out_layernorm:
            src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="out_ln")(src)
        return src
