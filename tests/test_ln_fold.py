"""The per-layer target-LayerNorm fold (standardize once + fold scale/bias
into the kv projection) is exact vs applying LayerNorm then projecting."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from trafficbotsv15_tpu.models.transformer import AttentionRPE, standardize


def test_standardize_matches_flax_layernorm():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 7, 32))
    # epsilon pinned to 1e-5: the model stack matches torch's LayerNorm eps
    # (see models/transformer.py::standardize), not flax's 1e-6 default
    ln = nn.LayerNorm(use_scale=False, use_bias=False, epsilon=1e-5)
    ref = ln.apply({"params": {}}, x)
    np.testing.assert_allclose(np.asarray(standardize(x)), np.asarray(ref), atol=1e-5)


def test_ln_fold_exact_with_rpe():
    key = jax.random.PRNGKey(1)
    tgt = jax.random.normal(key, (2, 5, 6, 32))
    rpe = jax.random.normal(jax.random.fold_in(key, 1), (2, 5, 6, 8))
    gamma = jax.random.normal(jax.random.fold_in(key, 2), (32,)) + 1.0
    beta = jax.random.normal(jax.random.fold_in(key, 3), (32,))

    mod = AttentionRPE(d_model=32, n_head=2, d_rpe=8, dtype=jnp.float32)
    params = mod.init(key, None, standardize(tgt), rpe=rpe,
                      compute_static_kv=True, tgt_ln=(gamma, beta))

    k1, v1 = mod.apply(params, None, standardize(tgt), rpe=rpe,
                       compute_static_kv=True, tgt_ln=(gamma, beta))
    # reference: explicit LayerNorm, then the (unfolded) projection
    ln_tgt = gamma * standardize(tgt) + beta
    k2, v2 = mod.apply(params, None, ln_tgt, rpe=rpe, compute_static_kv=True)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=2e-5)


def test_ln_fold_exact_without_rpe():
    key = jax.random.PRNGKey(4)
    tgt = jax.random.normal(key, (2, 5, 6, 32))
    gamma = jax.random.normal(jax.random.fold_in(key, 2), (32,)) + 1.0
    beta = jax.random.normal(jax.random.fold_in(key, 3), (32,))

    mod = AttentionRPE(d_model=32, n_head=2, dtype=jnp.float32)
    params = mod.init(key, None, standardize(tgt), compute_static_kv=True,
                      tgt_ln=(gamma, beta))
    k1, v1 = mod.apply(params, None, standardize(tgt), compute_static_kv=True,
                       tgt_ln=(gamma, beta))
    ln_tgt = gamma * standardize(tgt) + beta
    k2, v2 = mod.apply(params, None, ln_tgt, compute_static_kv=True)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=2e-5)


def test_knn_attention_fullwidth_matches_split():
    from trafficbotsv15_tpu.ops.attention import knn_attention, knn_attention_fullwidth

    key = jax.random.PRNGKey(7)
    b, s, K, h, dh = 2, 5, 6, 2, 16
    D = h * dh
    q = jax.random.normal(key, (b, s, D))
    kf = jax.random.normal(jax.random.fold_in(key, 1), (b, s, K, D))
    vf = jax.random.normal(jax.random.fold_in(key, 2), (b, s, K, D))
    invalid = jax.random.uniform(jax.random.fold_in(key, 3), (b, s, K)) < 0.3
    invalid = invalid.at[0, 1].set(True)  # all-invalid row -> zero output

    ref, _ = knn_attention(
        q.reshape(b, s, h, dh), kf.reshape(b, s, K, h, dh), vf.reshape(b, s, K, h, dh), invalid)
    got = knn_attention_fullwidth(q, kf, vf, invalid, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got)[0, 1], 0.0)


def test_pe_xy_dir_fast_path_bit_exact():
    """The one-shot angle-tensor pe_xy_dir equals the per-quantity
    sinusoid_embed concat bit-for-bit (same values, same feature order)."""
    from trafficbotsv15_tpu.ops.pose_emb import _as_cos_sin, pose_embed_pe_xy_dir, sinusoid_embed

    key = jax.random.PRNGKey(11)
    xy = jax.random.normal(key, (3, 5, 2)) * 40
    dirn = jax.random.normal(jax.random.fold_in(key, 1), (3, 5, 1))
    d = _as_cos_sin(dirn)
    for pe_dim in (64, 128):
        got = pose_embed_pe_xy_dir(xy, dirn, pe_dim, 1e3, 1e1)
        q = pe_dim // 4
        ref = jnp.concatenate([
            sinusoid_embed(xy[..., 0], q, 1e3), sinusoid_embed(xy[..., 1], q, 1e3),
            sinusoid_embed(d[..., 0], q, 1e1), sinusoid_embed(d[..., 1], q, 1e1)], -1)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.slow
def test_attn_dropout_weights_mode():
    """attn_dropout_weights=True (reference placement, attention_rpe.py:168):
    deterministic output matches the default mode exactly; active dropout
    perturbs the output."""
    import dataclasses

    from trafficbotsv15_tpu.config import tiny_config
    from trafficbotsv15_tpu.data.synthetic import make_batch
    from trafficbotsv15_tpu.train.pipeline import build_model, init_params, training_forward

    cfg = tiny_config()
    m = cfg.model
    cfg_w = dataclasses.replace(cfg, model=dataclasses.replace(
        m, tf_cfg=dataclasses.replace(m.tf_cfg, attn_dropout_weights=True)))
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg.data, n_sc=1, seed=9).items()}
    model = build_model(cfg)
    model_w = build_model(cfg_w)
    params = init_params(cfg, model, batch, jax.random.PRNGKey(0))

    # same params work in both modes (no new parameters), and the TRAINING
    # forward differs between modes only through where dropout is applied:
    # with the same rng key the losses differ but both are finite
    l0, _ = training_forward(cfg, model, params, batch, jax.random.PRNGKey(3))
    lw, _ = training_forward(cfg_w, model_w, params, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(l0)) and np.isfinite(float(lw))
    assert float(l0) != float(lw)


def test_two_stage_knn_select_bit_exact(monkeypatch):
    """The two-stage exact top-k equals single top_k bit-for-bit, including
    tie order (stable, lowest index first) and all-invalid (inf) rows."""
    import os

    from trafficbotsv15_tpu.ops.rpe import _knn_select

    rng = np.random.default_rng(1)
    d = rng.integers(0, 40, size=(2, 5, 1024)).astype(np.float32)  # heavy ties
    d[0, 0, :] = np.inf
    d[1, 1, 600:] = np.inf
    dj = jnp.asarray(d)
    monkeypatch.setenv("TB_TWO_STAGE_KNN", "1")
    got_d, got_i = _knn_select(dj, 64)
    monkeypatch.setenv("TB_TWO_STAGE_KNN", "0")
    ref_d, ref_i = _knn_select(dj, 64)
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))
