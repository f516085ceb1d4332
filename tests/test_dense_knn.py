"""Dense masked KNN self-attention vs the gather-based path (equivalence)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trafficbotsv15_tpu.models.transformer import AttentionRPE, TransformerBlock

RNG = np.random.default_rng(7)


def _mk(n_b=3, n_src=16, k=5, d_model=32, n_head=4, d_rpe=12):
    src = jnp.asarray(RNG.normal(size=(n_b, n_src, d_model)).astype(np.float32))
    idx = jnp.asarray(
        np.stack([
            np.stack([RNG.choice(n_src, size=k, replace=False) for _ in range(n_src)])
            for _ in range(n_b)
        ]).astype(np.int32)
    )
    inv = jnp.asarray(RNG.random((n_b, n_src, k)) < 0.3)
    inv = inv.at[0, 0].set(True)  # all-invalid row
    rpe = jnp.asarray(RNG.normal(size=(n_b, n_src, k, d_rpe)).astype(np.float32))
    return src, idx, inv, rpe


@pytest.mark.parametrize("with_rpe", [True, False])
def test_dense_knn_matches_gather(monkeypatch, with_rpe):
    src, idx, inv, rpe = _mk()
    mod = AttentionRPE(d_model=32, n_head=4, dropout_p=0.0, d_rpe=12 if with_rpe else -1)
    kw = dict(tgt_idx=idx, tgt_padding_mask=inv, rpe=rpe if with_rpe else None)
    params = mod.init(jax.random.PRNGKey(0), src, **kw)

    monkeypatch.setenv("TB_DENSE_KNN_MAX", "0")
    gathered = mod.apply(params, src, **kw)
    monkeypatch.setenv("TB_DENSE_KNN_MAX", "128")
    dense = mod.apply(params, src, **kw)

    np.testing.assert_allclose(np.asarray(dense), np.asarray(gathered), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dense)[0, 0], 0.0)  # all-invalid row zeroed


@pytest.mark.slow
def test_dense_knn_block_grads_match(monkeypatch):
    """Full enc_self_attn block: forward and grads agree across the two paths."""
    src, idx, inv, rpe = _mk(n_b=2, n_src=12, k=4)
    block = TransformerBlock(d_model=32, n_head=4, dropout_p=0.0, n_layer=2,
                             mode="enc_self_attn", d_rpe=12)
    kw = dict(tgt_idx=idx, tgt_padding_mask=inv, rpe=rpe)
    params = block.init(jax.random.PRNGKey(1), src, **kw)

    def loss(p, s):
        return jnp.sum(block.apply(p, s, **kw) ** 2)

    monkeypatch.setenv("TB_DENSE_KNN_MAX", "0")
    l0, g0 = jax.value_and_grad(loss, argnums=1)(params, src)
    monkeypatch.setenv("TB_DENSE_KNN_MAX", "128")
    l1, g1 = jax.value_and_grad(loss, argnums=1)(params, src)

    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=3e-5)


@pytest.mark.slow
def test_gather_path_with_fullwidth_static_rpe(monkeypatch):
    """TB_DENSE_KNN_MAX=0 forces the project-then-gather self-attn path; the
    fullwidth static rpe cache must be head-split there (latent-crash guard)."""
    monkeypatch.setenv("TB_DENSE_KNN_MAX", "0")
    import jax

    from trafficbotsv15_tpu.config import tiny_config
    from trafficbotsv15_tpu.data.preprocessing import pre_processing
    from trafficbotsv15_tpu.data.synthetic import make_batch
    from trafficbotsv15_tpu.train.pipeline import build_model, init_params

    cfg = tiny_config()
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg.data, n_sc=1, seed=3).items()}
    model = build_model(cfg)
    params = init_params(cfg, model, batch, jax.random.PRNGKey(0))
    pp = pre_processing(batch, tl_mode=cfg.model.tl_mode, navi_mode=cfg.model.navi_mode,
                        n_step_hist=cfg.n_step_hist, training=True)
    mp = model.apply({"params": params}, pp.mp_valid, pp.mp_attr, pp.mp_pose, pp.mp_type,
                     method="encode_map")
    tl = model.apply({"params": params}, pp.tl_valid, pp.tl_attr, pp.tl_pose, mp,
                     method="precompute_tl")
    # TL per-step forward consumes the static caches through the gather path
    feat = model.apply(
        {"params": params}, pp.tl_state[:, :, -3:].astype(jnp.float32), tl,
        method=lambda m, s, t: m.tl_encoder(s, t),
    )
    assert np.isfinite(np.asarray(feat)).all()
