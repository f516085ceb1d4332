"""Fused Pallas KNN kernel vs the stable-sort reference path.

The kernel's contract (ops/pallas_knn.py): the TB_KNN_IMPL=sort selection
(ascending distance, stable ascending-index tie order, +inf invalid pairs)
over its distance tensor. On exactly-representable (integer-grid)
coordinates — where FMA contraction cannot change a single bit — outputs
must be BIT-identical to the sort path, ties included. On arbitrary float
coordinates the distances may differ from the XLA lowering by 1 ULP, so
there the test asserts identical index selections and 1e-6-tight values.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trafficbotsv15_tpu.ops.pallas_knn import knn_xy_pallas, pallas_knn_wanted


def _sort_reference(src_xy, src_invalid, tgt_xy, tgt_invalid, k):
    """The TB_KNN_IMPL=sort path: masked distances + stable variadic sort."""
    rel_dist = jnp.linalg.norm(src_xy[:, :, None, :] - tgt_xy[:, None, :, :], axis=-1)
    rel_dist = jnp.where(src_invalid[:, :, None] | tgt_invalid[:, None, :], jnp.inf, rel_dist)
    neg_dist, idx = jax.lax.top_k(-rel_dist, k)
    return -neg_dist, idx


def _rand_case(key, n_rows, n_src, n_tgt, p_invalid=0.2, integer_grid=False):
    ks = jax.random.split(key, 4)
    src_xy = jax.random.uniform(ks[0], (n_rows, n_src, 2), minval=-100, maxval=100)
    tgt_xy = jax.random.uniform(ks[1], (n_rows, n_tgt, 2), minval=-100, maxval=100)
    if integer_grid:
        # coords on a coarse 10-unit grid in [-100, 100]: dx^2+dy^2 <= 80000
        # is exact in f32, so FMA vs non-FMA lowerings agree bitwise AND
        # exact distance ties are common — this exercises the stable tie
        # order for real
        src_xy = jnp.round(src_xy / 10.0) * 10.0
        tgt_xy = jnp.round(tgt_xy / 10.0) * 10.0
    src_invalid = jax.random.uniform(ks[2], (n_rows, n_src)) < p_invalid
    tgt_invalid = jax.random.uniform(ks[3], (n_rows, n_tgt)) < p_invalid
    return src_xy, src_invalid, tgt_xy, tgt_invalid


@pytest.mark.parametrize(
    "n_rows,n_src,n_tgt,k",
    [
        (3, 8, 128, 4),
        (2, 16, 256, 32),
        (1, 8, 128, 128),  # k == n_tgt
        (2, 64, 384, 64),
        (8, 64, 512, 32),  # rows-per-program blocking = 4 (the flagship path)
    ],
)
def test_bit_identity_vs_sort_on_exact_coords(n_rows, n_src, n_tgt, k):
    src_xy, src_invalid, tgt_xy, tgt_invalid = _rand_case(
        jax.random.PRNGKey(hash((n_rows, n_src, n_tgt, k)) % 2**31),
        n_rows, n_src, n_tgt, integer_grid=True,
    )
    d_ref, i_ref = _sort_reference(src_xy, src_invalid, tgt_xy, tgt_invalid, k)
    d_pl, i_pl = knn_xy_pallas(src_xy, src_invalid, tgt_xy, tgt_invalid, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(d_pl), np.asarray(d_ref))
    np.testing.assert_array_equal(np.asarray(i_pl), np.asarray(i_ref))
    # the integer grid must actually produce distance ties for the stable-
    # order claim to be exercised (not vacuous)
    flat = np.asarray(d_ref).reshape(-1, k)
    assert any(len(np.unique(row[np.isfinite(row)])) < np.isfinite(row).sum() for row in flat)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_float_coords_same_selection(seed):
    """Arbitrary floats: 1-ULP FMA differences may perturb distance VALUES
    but must not change the selected indices on generic data."""
    src_xy, src_invalid, tgt_xy, tgt_invalid = _rand_case(
        jax.random.PRNGKey(seed), 2, 16, 256
    )
    k = 32
    d_ref, i_ref = _sort_reference(src_xy, src_invalid, tgt_xy, tgt_invalid, k)
    d_pl, i_pl = knn_xy_pallas(src_xy, src_invalid, tgt_xy, tgt_invalid, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_pl), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref), rtol=1e-6)


def test_all_invalid_rows_and_targets():
    """Fewer valid targets than k: the +inf tail lists ascending indices, the
    stable sort's order; fully-invalid sources are all-inf."""
    src_xy, _, tgt_xy, _ = _rand_case(jax.random.PRNGKey(0), 2, 8, 128, integer_grid=True)
    src_invalid = jnp.zeros((2, 8), bool).at[0, 3].set(True)
    tgt_invalid = jnp.ones((2, 128), bool).at[:, :5].set(False)  # 5 valid < k
    k = 16
    d_ref, i_ref = _sort_reference(src_xy, src_invalid, tgt_xy, tgt_invalid, k)
    d_pl, i_pl = knn_xy_pallas(src_xy, src_invalid, tgt_xy, tgt_invalid, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(d_pl), np.asarray(d_ref))
    np.testing.assert_array_equal(np.asarray(i_pl), np.asarray(i_ref))
    assert np.all(np.isinf(np.asarray(d_pl)[0, 3]))


def test_sharded_kernel_on_mesh():
    """The distributed steps shard_map the kernel over the data axis (GSPMD
    would otherwise replicate the opaque custom call) — prove the sharded
    wrapping computes the same selection, in interpret mode on the 8-device
    CPU mesh."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from trafficbotsv15_tpu.parallel.mesh import DATA_AXIS, make_mesh

    mesh = make_mesh()
    n_rows = 2 * mesh.shape[DATA_AXIS]
    src_xy, src_invalid, tgt_xy, tgt_invalid = _rand_case(
        jax.random.PRNGKey(3), n_rows, 16, 512, integer_grid=True
    )
    k = 16
    spec = P(DATA_AXIS)
    fn = jax.jit(shard_map(
        lambda a, b, c, e: knn_xy_pallas(a, b, c, e, k, interpret=True),
        mesh=mesh, in_specs=(spec,) * 4, out_specs=(spec, spec), check_rep=False,
    ))
    args = [jax.device_put(x, NamedSharding(mesh, spec))
            for x in (src_xy, src_invalid, tgt_xy, tgt_invalid)]
    d_pl, i_pl = fn(*args)
    d_ref, i_ref = _sort_reference(src_xy, src_invalid, tgt_xy, tgt_invalid, k)
    np.testing.assert_array_equal(np.asarray(d_pl), np.asarray(d_ref))
    np.testing.assert_array_equal(np.asarray(i_pl), np.asarray(i_ref))


def test_shape_gate_and_kill_switch(monkeypatch):
    """Default ON at the measured-win shapes; TB_KNN_PALLAS=0 disables."""
    assert pallas_knn_wanted(64, 1024)
    assert not pallas_knn_wanted(64, 256)   # narrow targets: XLA stays
    assert not pallas_knn_wanted(64, 1000)  # lane-tiling guard
    assert not pallas_knn_wanted(3, 1024)   # sublane guard
    monkeypatch.setenv("TB_KNN_PALLAS", "0")
    assert not pallas_knn_wanted(64, 1024)


def test_lazy_knn_pallas_route_matches(monkeypatch):
    """get_tgt_knn_lazy with TB_KNN_PALLAS=1: on CPU the platform_dependent
    fallback must reproduce the default path exactly (the TPU branch is
    covered bit-exactly by the kernel tests above + the on-chip A/B)."""
    from trafficbotsv15_tpu.ops import rpe

    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 4)
    src_pose = jax.random.uniform(ks[0], (2, 16, 3), minval=-50, maxval=50)
    tgt_pose = jax.random.uniform(ks[1], (2, 512, 3), minval=-50, maxval=50)
    src_invalid = jax.random.uniform(ks[2], (2, 16)) < 0.2
    tgt_invalid = jax.random.uniform(ks[3], (2, 512)) < 0.2

    ref = rpe.get_tgt_knn_lazy(src_pose, src_invalid, tgt_pose, tgt_invalid, 24, 60.0)
    monkeypatch.setenv("TB_KNN_PALLAS", "1")
    got = rpe.get_tgt_knn_lazy(src_pose, src_invalid, tgt_pose, tgt_invalid, 24, 60.0)
    assert pallas_knn_wanted(16, 512)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
