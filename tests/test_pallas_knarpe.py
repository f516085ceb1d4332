"""Pallas KNARPE kernel vs XLA reference (interpret mode on CPU).

The same kernels run compiled by Mosaic on TPU (validated on-device, see
docs/PERF.md); interpret mode checks the math, including the fused backward.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# the KNARPE attention kernels are default-OFF (XLA wins at both measured
# scales, docs/PERF.md chain9); their interpret-mode math checks run in the
# slow tier (launch/ci.sh) to keep the default suite inside its budget
pytestmark = pytest.mark.slow

from trafficbotsv15_tpu.ops.pallas_knarpe import (
    knarpe_attention,
    knarpe_attention_reference,
)

RNG = np.random.default_rng(0)


def _make_inputs(n_b, n_s, n_knn, n_head, d_head, r):
    d_model = n_head * d_head
    q = jnp.asarray(RNG.normal(size=(n_b, n_s, d_model)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(n_b, n_s, n_knn, d_model)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(n_b, n_s, n_knn, d_model)).astype(np.float32))
    rpe = jnp.asarray(RNG.normal(size=(n_b, n_s, n_knn, r)).astype(np.float32))
    invalid = jnp.asarray(RNG.random((n_b, n_s, n_knn)) < 0.3)
    invalid = invalid.at[0, 0].set(True)  # all-invalid row
    w = jnp.asarray(RNG.normal(size=(r, 2 * d_model)).astype(np.float32)) * 0.1
    b = jnp.asarray(RNG.normal(size=(2 * d_model,)).astype(np.float32)) * 0.1
    return q, k, v, rpe, invalid, w, b


@pytest.mark.parametrize("n_s,s_tile", [(8, 4), (16, 8), (10, 4)])
def test_forward_matches_reference(n_s, s_tile):
    n_b, n_knn, n_head, d_head, r = 2, 4, 2, 8, 16
    q, k, v, rpe, invalid, w, b = _make_inputs(n_b, n_s, n_knn, n_head, d_head, r)

    expected = knarpe_attention_reference(q, k, v, rpe, invalid, w, b, n_head)
    got = knarpe_attention(q, k, v, rpe, invalid, w, b, n_head, s_tile, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4)
    # all-invalid row -> zeros
    np.testing.assert_allclose(np.asarray(got)[0, 0], 0.0)


def test_backward_matches_reference():
    n_b, n_s, n_knn, n_head, d_head, r = 2, 8, 4, 2, 8, 16
    q, k, v, rpe, invalid, w, b = _make_inputs(n_b, n_s, n_knn, n_head, d_head, r)
    g = jnp.asarray(RNG.normal(size=(n_b, n_s, n_head * d_head)).astype(np.float32))

    def loss_pl(q, k, v, rpe, w, b):
        return jnp.vdot(knarpe_attention(q, k, v, rpe, invalid, w, b, n_head, 4, True), g)

    def loss_ref(q, k, v, rpe, w, b):
        out = knarpe_attention_reference(q, k, v, rpe, invalid, w, b, n_head)
        return jnp.vdot(out.reshape(g.shape), g)

    grads_pl = jax.grad(loss_pl, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, rpe, w, b)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, rpe, w, b)
    for name, a, e in zip("q k v rpe w b".split(), grads_pl, grads_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=5e-4, err_msg=name)


# ---------------------------------------------------------------- v2 kernel
from trafficbotsv15_tpu.ops.pallas_knarpe import (  # noqa: E402
    knarpe_cross_attention,
    knarpe_cross_attention_reference,
)


def _make_x_inputs(n_b, n_s, n_knn, n_head, d_head, r):
    d_model = n_head * d_head
    q = jnp.asarray(RNG.normal(size=(n_b, n_s, d_model)).astype(np.float32))
    tgt = jnp.asarray(RNG.normal(size=(n_b, n_s, n_knn, d_model)).astype(np.float32))
    rpe = jnp.asarray(RNG.normal(size=(n_b, n_s, n_knn, r)).astype(np.float32))
    invalid = jnp.asarray(RNG.random((n_b, n_s, n_knn)) < 0.3)
    invalid = invalid.at[0, 1].set(True)  # all-invalid row
    w_kv = jnp.asarray(RNG.normal(size=(d_model, 2 * d_model)).astype(np.float32)) * 0.1
    w_rpe = jnp.asarray(RNG.normal(size=(r, 2 * d_model)).astype(np.float32)) * 0.1
    b = jnp.asarray(RNG.normal(size=(2 * d_model,)).astype(np.float32)) * 0.1
    return q, tgt, rpe, invalid, w_kv, w_rpe, b


@pytest.mark.parametrize("n_s,s_tile", [(8, 4), (10, 4)])
def test_cross_forward_matches_reference(n_s, s_tile):
    n_b, n_knn, n_head, d_head, r = 2, 5, 2, 8, 16
    q, tgt, rpe, invalid, w_kv, w_rpe, b = _make_x_inputs(n_b, n_s, n_knn, n_head, d_head, r)
    expected = knarpe_cross_attention_reference(q, tgt, rpe, invalid, w_kv, w_rpe, b, n_head)
    got = knarpe_cross_attention(q, tgt, rpe, invalid, w_kv, w_rpe, b, n_head, s_tile, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got)[0, 1], 0.0)


def test_cross_backward_matches_reference():
    n_b, n_s, n_knn, n_head, d_head, r = 2, 8, 4, 2, 8, 16
    q, tgt, rpe, invalid, w_kv, w_rpe, b = _make_x_inputs(n_b, n_s, n_knn, n_head, d_head, r)
    g = jnp.asarray(RNG.normal(size=(n_b, n_s, n_head * d_head)).astype(np.float32))

    def loss_pallas(q, tgt, rpe, w_kv, w_rpe, b):
        out = knarpe_cross_attention(q, tgt, rpe, invalid, w_kv, w_rpe, b, n_head, 4, True)
        return jnp.sum(out * g)

    def loss_ref(q, tgt, rpe, w_kv, w_rpe, b):
        out = knarpe_cross_attention_reference(q, tgt, rpe, invalid, w_kv, w_rpe, b, n_head)
        return jnp.sum(out * g)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4, 5))(q, tgt, rpe, w_kv, w_rpe, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(q, tgt, rpe, w_kv, w_rpe, b)
    for a, e, name in zip(gp, gr, ("dq", "dtgt", "drpe", "dw_kv", "dw_rpe", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=5e-4, err_msg=name)


@pytest.mark.parametrize("n_s,s_tile", [(10, 4), (9, 8)])
def test_backward_non_divisible_tiles(n_s, s_tile):
    """Backward with n_s % s_tile != 0: padding rows of the last grid tile are
    masked before the grid-accumulated dw/db (on TPU the padded block contents
    are unspecified)."""
    n_b, n_knn, n_head, d_head, r = 1, 4, 2, 8, 16
    q, k, v, rpe, invalid, w, b = _make_inputs(n_b, n_s, n_knn, n_head, d_head, r)
    g = jnp.asarray(RNG.normal(size=(n_b, n_s, n_head * d_head)).astype(np.float32))

    def loss_pallas(q, k, v, rpe, w, b):
        out = knarpe_attention(q, k, v, rpe, invalid, w, b, n_head, s_tile, True)
        return jnp.sum(out * g)

    def loss_ref(q, k, v, rpe, w, b):
        out = knarpe_attention_reference(q, k, v, rpe, invalid, w, b, n_head)
        return jnp.sum(out * g)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, rpe, w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, rpe, w, b)
    for a, e, name in zip(gp, gr, ("dq", "dk", "dv", "drpe", "dw", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=5e-4, err_msg=name)


@pytest.mark.parametrize("n_s,s_tile", [(10, 4)])
def test_cross_backward_non_divisible_tiles(n_s, s_tile):
    n_b, n_knn, n_head, d_head, r = 1, 5, 2, 8, 16
    q, tgt, rpe, invalid, w_kv, w_rpe, b = _make_x_inputs(n_b, n_s, n_knn, n_head, d_head, r)
    g = jnp.asarray(RNG.normal(size=(n_b, n_s, n_head * d_head)).astype(np.float32))

    def loss_pallas(q, tgt, rpe, w_kv, w_rpe, b):
        out = knarpe_cross_attention(q, tgt, rpe, invalid, w_kv, w_rpe, b, n_head, s_tile, True)
        return jnp.sum(out * g)

    def loss_ref(q, tgt, rpe, w_kv, w_rpe, b):
        out = knarpe_cross_attention_reference(q, tgt, rpe, invalid, w_kv, w_rpe, b, n_head)
        return jnp.sum(out * g)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4, 5))(q, tgt, rpe, w_kv, w_rpe, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(q, tgt, rpe, w_kv, w_rpe, b)
    for a, e, name in zip(gp, gr, ("dq", "dtgt", "drpe", "dw_kv", "dw_rpe", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=5e-4, err_msg=name)


# ---------------------------------------------------------------- v3 kernel
from trafficbotsv15_tpu.ops.pallas_knarpe import knarpe_cross_attention_v3  # noqa: E402


@pytest.mark.parametrize("n_b,n_s,s_tile", [(1, 8, 4), (1, 10, 4), (2, 8, 4)])
def test_cross_v3_forward_matches_reference(n_b, n_s, s_tile):
    """v3 (bf16-capable, sequential k/v halves) in f32 interpret mode must match
    the XLA reference exactly like v2 does; n_b>1 exercises the batch-flatten
    wrapper, and the [0, 1] all-invalid row must come out zero."""
    n_knn, n_head, d_head, r = 5, 2, 8, 16
    q, tgt, rpe, invalid, w_kv, w_rpe, b = _make_x_inputs(n_b, n_s, n_knn, n_head, d_head, r)
    expected = knarpe_cross_attention_reference(q, tgt, rpe, invalid, w_kv, w_rpe, b, n_head)
    got = knarpe_cross_attention_v3(q, tgt, rpe, invalid, w_kv, w_rpe, b, n_head, s_tile, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got)[0, 1], 0.0)


def test_cross_v3_backward_matches_reference():
    """v3 backward routes through the shared v2 recompute kernel; check the
    full custom_vjp wiring end-to-end (incl. the None for `invalid`)."""
    n_b, n_s, n_knn, n_head, d_head, r = 2, 8, 4, 2, 8, 16
    q, tgt, rpe, invalid, w_kv, w_rpe, b = _make_x_inputs(n_b, n_s, n_knn, n_head, d_head, r)
    g = jnp.asarray(RNG.normal(size=(n_b, n_s, n_head * d_head)).astype(np.float32))

    def loss_v3(q, tgt, rpe, w_kv, w_rpe, b):
        out = knarpe_cross_attention_v3(q, tgt, rpe, invalid, w_kv, w_rpe, b, n_head, 4, True)
        return jnp.sum(out * g)

    def loss_ref(q, tgt, rpe, w_kv, w_rpe, b):
        out = knarpe_cross_attention_reference(q, tgt, rpe, invalid, w_kv, w_rpe, b, n_head)
        return jnp.sum(out * g)

    gp = jax.grad(loss_v3, argnums=(0, 1, 2, 3, 4, 5))(q, tgt, rpe, w_kv, w_rpe, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(q, tgt, rpe, w_kv, w_rpe, b)
    for a, e, name in zip(gp, gr, ("dq", "dtgt", "drpe", "dw_kv", "dw_rpe", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=5e-4, err_msg=name)


def test_cross_forward_scaled_dims_tile_clamp():
    """At scaled dims (d_model=256, K=89) the VMEM budget clamps s_tile below
    the flagship-tuned 64 (the unclamped tile stack-OOMed Mosaic on-device);
    the clamped kernel must still match the reference."""
    from trafficbotsv15_tpu.ops.pallas_knarpe import _pick_s_tile

    assert _pick_s_tile(512, 64, n_knn=89, d_model=256, n_temps=8) < 64
    n_b, n_s, n_knn, n_head, d_head, r = 1, 48, 89, 8, 32, 16
    q, tgt, rpe, invalid, w_kv, w_rpe, b = _make_x_inputs(n_b, n_s, n_knn, n_head, d_head, r)
    expected = knarpe_cross_attention_reference(q, tgt, rpe, invalid, w_kv, w_rpe, b, n_head)
    got = knarpe_cross_attention(q, tgt, rpe, invalid, w_kv, w_rpe, b, n_head, 64, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=5e-4)
