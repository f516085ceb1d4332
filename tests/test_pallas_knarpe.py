"""Pallas KNARPE kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

from trafficbotsv15_tpu.ops.pallas_knarpe import (
    _kernel,
    knarpe_attention_reference,
)
import functools

RNG = np.random.default_rng(0)


def _interpret_call(q, k, v, rpe, invalid, w, b, n_head, s_tile):
    n_b, n_s, n_knn, d_model = k.shape
    r = rpe.shape[-1]
    grid = (n_b, pl.cdiv(n_s, s_tile))
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        functools.partial(_kernel, n_head=n_head),
        out_shape=jax.ShapeDtypeStruct((n_b, n_s, d_model), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, s_tile, d_model), lambda bb, ss: (bb, ss, 0)),
            pl.BlockSpec((1, s_tile, n_knn, d_model), lambda bb, ss: (bb, ss, 0, 0)),
            pl.BlockSpec((1, s_tile, n_knn, d_model), lambda bb, ss: (bb, ss, 0, 0)),
            pl.BlockSpec((1, s_tile, n_knn, r), lambda bb, ss: (bb, ss, 0, 0)),
            pl.BlockSpec((1, s_tile, n_knn), lambda bb, ss: (bb, ss, 0)),
            pl.BlockSpec((r, 2 * d_model), lambda bb, ss: (0, 0)),
            pl.BlockSpec((2 * d_model,), lambda bb, ss: (0,)),
        ],
        out_specs=pl.BlockSpec((1, s_tile, d_model), lambda bb, ss: (bb, ss, 0)),
        interpret=True,
    )(q, k, v, rpe, invalid, w, b)


@pytest.mark.parametrize("n_s,s_tile", [(8, 4), (16, 8)])
def test_kernel_matches_reference(n_s, s_tile):
    n_b, n_knn, n_head, d_head, r = 2, 4, 2, 8, 16
    d_model = n_head * d_head
    q = jnp.asarray(RNG.normal(size=(n_b, n_s, d_model)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(n_b, n_s, n_knn, d_model)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(n_b, n_s, n_knn, d_model)).astype(np.float32))
    rpe = jnp.asarray(RNG.normal(size=(n_b, n_s, n_knn, r)).astype(np.float32))
    invalid = jnp.asarray(RNG.random((n_b, n_s, n_knn)) < 0.3)
    invalid = invalid.at[0, 0].set(True)  # all-invalid row
    w = jnp.asarray(RNG.normal(size=(r, 2 * d_model)).astype(np.float32)) * 0.1
    b = jnp.asarray(RNG.normal(size=(2 * d_model,)).astype(np.float32)) * 0.1

    expected = knarpe_attention_reference(q, k, v, rpe, invalid, w, b, n_head)
    got = _interpret_call(q, k, v, rpe, invalid, w, b, n_head, s_tile)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4)
    # all-invalid row -> zeros
    np.testing.assert_allclose(np.asarray(got)[0, 0], 0.0)
