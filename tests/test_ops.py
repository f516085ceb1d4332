"""Unit tests for the ops layer: transforms, pose embeddings, KNN/RPE, pooling,
attention and distributions — checked against hand-written numpy math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trafficbotsv15_tpu.ops import (
    cast_rad,
    rad2rot,
    pos2local,
    pos2global,
    rad2local,
    rad2global,
    sinusoid_embed,
    sinusoid_embed_rad,
    apply_pose_emb,
    pose_emb_out_dim,
    get_rel_pose,
    get_rel_dist,
    get_tgt_knn,
    seq_pooling,
)
from trafficbotsv15_tpu.ops.pose_emb import PoseEmbConfig
from trafficbotsv15_tpu.ops.rpe import gather_tgt
from trafficbotsv15_tpu.ops.attention import dense_attention, knn_attention
from trafficbotsv15_tpu.ops.distributions import (
    DiagGaussian,
    MultiCategorical,
    DestCategorical,
    kl_diag_gaussian,
    balanced_kl,
)

RNG = np.random.default_rng(0)


def test_cast_rad():
    x = np.array([0.0, np.pi, -np.pi, 3 * np.pi, -3.5 * np.pi, 0.5])
    out = np.asarray(cast_rad(jnp.asarray(x)))
    assert np.all(out >= -np.pi - 1e-6) and np.all(out < np.pi + 1e-6)
    np.testing.assert_allclose(np.sin(out), np.sin(x), atol=1e-5)
    np.testing.assert_allclose(np.cos(out), np.cos(x), atol=1e-5)


def test_pos_local_global_roundtrip():
    pts = RNG.normal(size=(2, 5, 2)).astype(np.float32)
    origin = RNG.normal(size=(2, 1, 2)).astype(np.float32)
    yaw = RNG.uniform(-np.pi, np.pi, size=(2,)).astype(np.float32)
    rot = rad2rot(jnp.asarray(yaw))
    local = pos2local(jnp.asarray(pts), jnp.asarray(origin), rot)
    back = pos2global(local, jnp.asarray(origin), rot)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-5)

    # a point on the +x axis of the frame maps to (d, 0)
    d = 3.0
    p = origin[:, 0] + d * np.stack([np.cos(yaw), np.sin(yaw)], axis=-1)
    loc = pos2local(jnp.asarray(p[:, None]), jnp.asarray(origin), rot)
    np.testing.assert_allclose(np.asarray(loc)[:, 0], np.array([[d, 0.0]] * 2), atol=1e-5)


def test_rad_local_global():
    yaw = jnp.asarray(RNG.uniform(-np.pi, np.pi, size=(3, 4)).astype(np.float32))
    frame = jnp.asarray(RNG.uniform(-np.pi, np.pi, size=(3,)).astype(np.float32))
    loc = rad2local(yaw, frame)
    glob = rad2global(loc, frame)
    np.testing.assert_allclose(np.sin(np.asarray(glob)), np.sin(np.asarray(yaw)), atol=1e-5)


def test_sinusoid_embed_structure():
    x = jnp.asarray([0.0, 1.0])
    emb = np.asarray(sinusoid_embed(x, 8, 1000.0))
    assert emb.shape == (2, 8)
    np.testing.assert_allclose(emb[0], np.array([1, 1, 1, 1, 0, 0, 0, 0]), atol=1e-6)
    freqs = 1.0 / 1000.0 ** (np.arange(0, 8, 2)[:4] / 8)
    np.testing.assert_allclose(emb[1, :4], np.cos(freqs), atol=1e-5)
    np.testing.assert_allclose(emb[1, 4:], np.sin(freqs), atol=1e-5)

    emb_rad = np.asarray(sinusoid_embed_rad(jnp.asarray([0.5]), 4))
    np.testing.assert_allclose(emb_rad[0], [np.cos(0.5), np.cos(1.0), np.sin(0.5), np.sin(1.0)], atol=1e-5)


@pytest.mark.parametrize("mode,expected_dim", [("xy_dir", 4), ("mpa_pl", 7), ("pe_xy_dir", 64), ("pe_xy_yaw", 64)])
def test_pose_emb_modes(mode, expected_dim):
    cfg = PoseEmbConfig(mode=mode, pe_dim=64)
    assert pose_emb_out_dim(cfg) == expected_dim
    xy = jnp.asarray(RNG.normal(size=(2, 3, 2)).astype(np.float32))
    yaw = jnp.asarray(RNG.uniform(-np.pi, np.pi, size=(2, 3, 1)).astype(np.float32))
    out = apply_pose_emb(cfg, xy, yaw)
    assert out.shape == (2, 3, expected_dim)
    assert np.all(np.isfinite(np.asarray(out)))
    # yaw [...,1] and cos/sin [...,2] inputs must agree
    cs = jnp.concatenate([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)
    out2 = apply_pose_emb(cfg, xy, cs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_rel_pose_and_dist():
    pose = np.zeros((1, 3, 3), dtype=np.float32)
    pose[0, 0] = [0.0, 0.0, 0.0]
    pose[0, 1] = [1.0, 0.0, np.pi / 2]
    pose[0, 2] = [0.0, 2.0, 0.0]
    invalid = np.array([[False, False, True]])
    rel_pose, rel_dist = get_rel_pose(jnp.asarray(pose), jnp.asarray(invalid))
    rel_pose, rel_dist = np.asarray(rel_pose), np.asarray(rel_dist)
    # target 1 in frame of source 0: dx=1, dy=0, dyaw=pi/2
    np.testing.assert_allclose(rel_pose[0, 0, 1], [1.0, 0.0, np.pi / 2], atol=1e-5)
    # target 0 in frame of source 1 (rotated 90deg): local of (-1, 0) under yaw pi/2 is (0, 1)... check by math
    exp = np.array([-1.0 * np.cos(np.pi / 2) + 0.0, 1.0 * np.sin(np.pi / 2)])
    np.testing.assert_allclose(rel_pose[0, 1, 0, :2], exp, atol=1e-5)
    assert np.isinf(rel_dist[0, 0, 2]) and np.isinf(rel_dist[0, 2, 0])
    np.testing.assert_allclose(rel_dist[0, 0, 1], 1.0, atol=1e-5)

    rd = np.asarray(get_rel_dist(jnp.asarray(pose[..., :2]), jnp.asarray(invalid)))
    np.testing.assert_allclose(rd[0, 0, 1], 1.0, atol=1e-5)
    assert np.isinf(rd[0, 1, 2])


def test_knn_selection():
    n_sc, n_src, n_tgt, k = 2, 4, 16, 3
    xy_src = RNG.normal(size=(n_sc, n_src, 2)).astype(np.float32) * 10
    xy_tgt = RNG.normal(size=(n_sc, n_tgt, 2)).astype(np.float32) * 10
    inv_src = np.zeros((n_sc, n_src), bool)
    inv_tgt = np.zeros((n_sc, n_tgt), bool)
    inv_tgt[:, 0] = True
    rel_dist = get_rel_dist(jnp.asarray(xy_src), jnp.asarray(inv_src), jnp.asarray(xy_tgt), jnp.asarray(inv_tgt))
    idx, inv_knn, _ = get_tgt_knn(jnp.asarray(inv_tgt), None, rel_dist, k, 1e9)
    idx, inv_knn = np.asarray(idx), np.asarray(inv_knn)
    assert idx.shape == (n_sc, n_src, k)
    d = np.linalg.norm(xy_src[:, :, None] - xy_tgt[:, None, :], axis=-1)
    d[:, :, 0] = np.inf  # invalid target
    expected = np.sort(d, axis=-1)[:, :, :k]
    got = np.sort(np.take_along_axis(d, idx, axis=-1), axis=-1)
    np.testing.assert_allclose(got, expected, atol=1e-4)
    assert not inv_knn.any()  # k nearest of 15 valid targets are all valid

    # distance limit masks far targets
    _, inv_knn2, _ = get_tgt_knn(jnp.asarray(inv_tgt), None, rel_dist, k, 1e-6)
    assert np.asarray(inv_knn2).all()


def test_gather_tgt():
    feat = jnp.asarray(RNG.normal(size=(2, 5, 8)).astype(np.float32))
    idx = jnp.asarray(RNG.integers(0, 5, size=(2, 3, 4)).astype(np.int32))
    out = np.asarray(gather_tgt(feat, idx))
    f, i = np.asarray(feat), np.asarray(idx)
    for b in range(2):
        for s in range(3):
            for kk in range(4):
                np.testing.assert_allclose(out[b, s, kk], f[b, i[b, s, kk]])


def test_seq_pooling():
    x = RNG.normal(size=(1, 2, 4, 3)).astype(np.float32)
    invalid = np.array([[[False, False, True, False], [True, True, True, True]]])
    xj, ij = jnp.asarray(x), jnp.asarray(invalid)

    out = np.asarray(seq_pooling(xj, ij, "max_valid"))
    np.testing.assert_allclose(out[0, 0], x[0, 0, [0, 1, 3]].max(0), atol=1e-6)
    np.testing.assert_allclose(out[0, 1], 0.0)

    out = np.asarray(seq_pooling(xj, ij, "last_valid"))
    np.testing.assert_allclose(out[0, 0], x[0, 0, 3], atol=1e-6)

    out = np.asarray(seq_pooling(xj, ij, "mean_valid"))
    np.testing.assert_allclose(out[0, 0], x[0, 0, [0, 1, 3]].mean(0), atol=1e-5)

    out = np.asarray(seq_pooling(xj, ij, "first"))
    np.testing.assert_allclose(out[0, 0], x[0, 0, 0], atol=1e-6)


def _np_softmax(x, axis=-1):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def test_dense_attention_matches_numpy():
    n_b, n_src, n_tgt, n_head, d_head = 2, 3, 5, 2, 4
    q = RNG.normal(size=(n_b, n_src, n_head, d_head)).astype(np.float32)
    k = RNG.normal(size=(n_b, n_tgt, n_head, d_head)).astype(np.float32)
    v = RNG.normal(size=(n_b, n_tgt, n_head, d_head)).astype(np.float32)
    invalid = RNG.random((n_b, n_src, n_tgt)) < 0.3
    invalid[0, 0] = True  # all-invalid row -> output must be 0

    out, _ = dense_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(invalid))
    out = np.asarray(out)

    logits = np.einsum("bshd,bthd->bhst", q, k) / np.sqrt(d_head)
    logits = np.where(invalid[:, None], -1e9, logits)
    attn = _np_softmax(logits)
    expected = np.einsum("bhst,bthd->bshd", attn, v).reshape(n_b, n_src, -1)
    expected[0, 0] = 0.0
    np.testing.assert_allclose(out, expected, atol=1e-4)


def test_knn_attention_matches_numpy():
    n_b, n_src, n_knn, n_head, d_head = 2, 3, 4, 2, 4
    q = RNG.normal(size=(n_b, n_src, n_head, d_head)).astype(np.float32)
    k = RNG.normal(size=(n_b, n_src, n_knn, n_head, d_head)).astype(np.float32)
    v = RNG.normal(size=(n_b, n_src, n_knn, n_head, d_head)).astype(np.float32)
    rpe_k = RNG.normal(size=k.shape).astype(np.float32)
    rpe_v = RNG.normal(size=v.shape).astype(np.float32)
    invalid = RNG.random((n_b, n_src, n_knn)) < 0.3
    invalid[1, 2] = True

    out, _ = knn_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(invalid),
        rpe_k=jnp.asarray(rpe_k), rpe_v=jnp.asarray(rpe_v),
    )
    out = np.asarray(out)

    logits = np.einsum("bshd,bskhd->bshk", q, k + rpe_k) / np.sqrt(d_head)
    logits = np.where(invalid[:, :, None], -1e9, logits)
    attn = _np_softmax(logits)
    expected = np.einsum("bshk,bskhd->bshd", attn, v + rpe_v).reshape(n_b, n_src, -1)
    expected[1, 2] = 0.0
    np.testing.assert_allclose(out, expected, atol=1e-4)


def test_diag_gaussian():
    mean = jnp.asarray([[0.0, 1.0]])
    std = jnp.asarray([[1.0, 2.0]])
    d = DiagGaussian(mean, std)
    x = jnp.asarray([[0.5, 0.0]])
    lp = float(d.log_prob(x)[0])
    expected = sum(
        -0.5 * ((xi - mi) / si) ** 2 - np.log(si) - 0.5 * np.log(2 * np.pi)
        for xi, mi, si in [(0.5, 0.0, 1.0), (0.0, 1.0, 2.0)]
    )
    assert abs(lp - expected) < 1e-5

    key = jax.random.PRNGKey(0)
    det = d.sample(key, True)
    np.testing.assert_allclose(np.asarray(det), np.asarray(mean))
    # mixed mask: first deterministic, second random
    d2 = DiagGaussian(jnp.zeros((2, 3)), jnp.ones((2, 3)))
    mask = jnp.asarray([True, False])
    s = d2.sample(key, mask)
    np.testing.assert_allclose(np.asarray(s)[0], 0.0)
    assert np.abs(np.asarray(s)[1]).sum() > 0


def test_multi_categorical_straight_through():
    logits = jnp.asarray(RNG.normal(size=(2, 3, 4, 5)).astype(np.float32))
    d = MultiCategorical(logits)
    key = jax.random.PRNGKey(1)
    s = d.sample(key, False)
    assert s.shape == (2, 3, 20)
    onehot = np.asarray(jax.lax.stop_gradient(s)).reshape(2, 3, 4, 5)
    np.testing.assert_allclose(onehot.sum(-1), 1.0, atol=1e-5)
    lp = d.log_prob(jax.lax.stop_gradient(s))
    assert lp.shape == (2, 3)
    # straight-through: gradient flows to logits
    g = jax.grad(lambda lg: MultiCategorical(lg).sample(key, False).sum())(logits)
    assert float(jnp.abs(g).sum()) > 0


def test_dest_categorical():
    logits = jnp.asarray(RNG.normal(size=(2, 3, 6)).astype(np.float32))
    d = DestCategorical(logits=logits)
    det = d.sample(jax.random.PRNGKey(0), True)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(jnp.argmax(logits, -1)))
    lp = d.log_prob(det)
    assert lp.shape == (2, 3)
    expected = np.asarray(jax.nn.log_softmax(logits, -1))
    got = np.take_along_axis(expected, np.asarray(det)[..., None], axis=-1)[..., 0]
    np.testing.assert_allclose(np.asarray(lp), got, atol=1e-5)


def test_balanced_kl():
    post = DiagGaussian(jnp.asarray([[1.0, 0.0]]), jnp.asarray([[1.0, 1.0]]))
    prior = DiagGaussian(jnp.zeros((1, 2)), jnp.ones((1, 2)))
    kl = float(kl_diag_gaussian(post, prior)[0])
    assert abs(kl - 0.5) < 1e-5  # KL(N(1,1)||N(0,1)) = 0.5
    bkl = float(balanced_kl(post, prior, alpha=0.2, free_nats=1.0)[0])
    assert abs(bkl - (1.0 + 0.2 * 1.0)) < 1e-5  # both terms clamped at free nats
    post2 = DiagGaussian(jnp.asarray([[3.0, 0.0]]), jnp.asarray([[1.0, 1.0]]))
    bkl2 = float(balanced_kl(post2, prior, alpha=0.2, free_nats=1.0)[0])
    assert abs(bkl2 - (4.5 + 0.2 * 4.5)) < 1e-4


def test_gather_tgt_onehot_matches():
    from trafficbotsv15_tpu.ops.rpe import gather_tgt, gather_tgt_onehot
    feat = jnp.asarray(RNG.normal(size=(2, 7, 8)).astype(np.float32))
    idx = jnp.asarray(RNG.integers(0, 7, size=(2, 3, 4)).astype(np.int32))
    a = np.asarray(gather_tgt(feat, idx))
    b = np.asarray(gather_tgt_onehot(feat, idx))
    np.testing.assert_allclose(a, b, atol=1e-5)
    # backward equivalence
    g1 = jax.grad(lambda f: gather_tgt(f, idx).sum())(feat)
    g2 = jax.grad(lambda f: gather_tgt_onehot(f, idx).sum())(feat)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_onehot_gather_scope():
    from trafficbotsv15_tpu.ops import rpe

    feat = jnp.asarray(RNG.normal(size=(1, 5, 4)).astype(np.float32))
    idx = jnp.asarray(RNG.integers(0, 5, size=(1, 2, 3)).astype(np.int32))
    ref = np.asarray(rpe.gather_tgt_onehot(feat, idx))
    assert not rpe._ONEHOT_GATHER_SCOPE[0]
    with rpe.onehot_gather_scope(True):
        assert rpe._ONEHOT_GATHER_SCOPE[0]
        np.testing.assert_allclose(np.asarray(rpe.gather_tgt(feat, idx)), ref, atol=1e-6)
        with rpe.onehot_gather_scope(False):
            assert not rpe._ONEHOT_GATHER_SCOPE[0]
        assert rpe._ONEHOT_GATHER_SCOPE[0]
    assert not rpe._ONEHOT_GATHER_SCOPE[0]


def test_get_tgt_knn_lazy_matches_eager():
    from trafficbotsv15_tpu.ops.rpe import get_rel_pose, get_tgt_knn, get_tgt_knn_lazy

    src = jnp.asarray(RNG.normal(size=(2, 16, 3)).astype(np.float32) * 30)
    tgt = jnp.asarray(RNG.normal(size=(2, 64, 3)).astype(np.float32) * 30)
    src_inv = jnp.asarray(RNG.random((2, 16)) < 0.2)
    tgt_inv = jnp.asarray(RNG.random((2, 64)) < 0.2)
    rel_pose, rel_dist = get_rel_pose(src, src_inv, tgt, tgt_inv)
    i1, v1, r1 = get_tgt_knn(tgt_inv, rel_pose, rel_dist, 8, 100.0)
    i2, v2, r2 = get_tgt_knn_lazy(src, src_inv, tgt, tgt_inv, 8, 100.0)
    assert bool(jnp.all(i1 == i2)) and bool(jnp.all(v1 == v2))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)


def test_knn_impl_partial_exact_set(monkeypatch):
    """The default TB_KNN_IMPL=partial (ApproxTopK at recall_target=1.0)
    returns exactly the k smallest distances — only the tie-break order may
    differ from the stable sort, which is semantically irrelevant (attention
    over the KNN set is permutation-invariant and the rpe is gathered by the
    same idx)."""
    from trafficbotsv15_tpu.ops.rpe import _knn_select

    d = RNG.uniform(size=(3, 8, 256)).astype(np.float32)
    d = np.round(d * 25) / 25  # force ties
    d[RNG.random(d.shape) < 0.3] = np.inf  # masked pairs
    part_d, part_i = _knn_select(jnp.asarray(d), 16)
    monkeypatch.setenv("TB_KNN_IMPL", "sort")
    sort_d, sort_i = _knn_select(jnp.asarray(d), 16)
    np.testing.assert_array_equal(
        np.sort(np.asarray(sort_d), axis=-1), np.sort(np.asarray(part_d), axis=-1))
    # idx agrees with its own values: d[idx] == dist for every selection
    np.testing.assert_array_equal(
        np.take_along_axis(d, np.asarray(part_i), axis=-1), np.asarray(part_d))


def test_pose_emb_flat_bit_identical(monkeypatch):
    """TB_POSE_EMB_FLAT=1 (flat [..., pe_dim] formulation — measured slower
    on v5e, kept as an A/B option) is bit-identical to the default stacked
    form for both sinusoidal modes."""
    from trafficbotsv15_tpu.ops.pose_emb import pose_embed_pe_xy_dir, pose_embed_pe_xy_yaw

    xy = jnp.asarray(RNG.normal(size=(9, 17, 2)).astype(np.float32) * 50)
    yaw = jnp.asarray(RNG.uniform(-np.pi, np.pi, size=(9, 17, 1)).astype(np.float32))
    for pe_dim in (64, 128):
        base_dir = np.asarray(pose_embed_pe_xy_dir(xy, yaw, pe_dim, 1e3, 1e1))
        base_yaw = np.asarray(pose_embed_pe_xy_yaw(xy, yaw, pe_dim, 1e3))
        monkeypatch.setenv("TB_POSE_EMB_FLAT", "1")
        flat_dir = np.asarray(pose_embed_pe_xy_dir(xy, yaw, pe_dim, 1e3, 1e1))
        flat_yaw = np.asarray(pose_embed_pe_xy_yaw(xy, yaw, pe_dim, 1e3))
        monkeypatch.delenv("TB_POSE_EMB_FLAT")
        np.testing.assert_array_equal(base_dir, flat_dir)
        np.testing.assert_array_equal(base_yaw, flat_yaw)
