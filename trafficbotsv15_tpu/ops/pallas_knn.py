"""Fused Pallas KNN kernel: pairwise distance + exact k-smallest selection.

The per-step KNN of the rollout (SURVEY §3 hot loop; parity target
/root/reference/src/utils/rpe.py::get_tgt_knn_idx) is, at flagship shapes,
a [n_rows=128, n_src=64, n_tgt=1024] distance tensor materialized to HBM
followed by a full variadic sort — 2.07 ms of the 25.7 ms rollout step
(docs/PERF.md chain5 profile), even though only the k=64 smallest entries
per source are consumed.

This kernel never leaves VMEM: each grid program loads the src/tgt planar
coordinates of a BLOCK of R scenario-rows (a few KB), computes their
[R * n_src, n_tgt] distance tile in a VMEM scratch, and extracts the k
smallest by iterative min-extraction (k passes of a VPU min-reduce +
first-index argmin + mask). Selection work is O(k * n_src * n_tgt)
elementwise ops with zero HBM traffic, vs the sort's O(n_tgt log^2 n_tgt)
compare-exchange network over rows it must round-trip.

Row-blocking is the key performance decision: TPU grid programs execute
SEQUENTIALLY on the core, and each extraction iteration is a dependent
reduce, so per-scenario programs serialize n_rows * k tiny reduces
(measured 3.2 ms at flagship shapes — slower than the sort). Stacking R
rows vertically makes every dependent step R times wider ([R*64, 1024]
tiles) at the same total op count: measured on the v5e at
[128, 64, 1024] k=64 in-scan, R=4 runs 1.91 ms vs 2.49 ms for the best
XLA lowering (approx_min_k at recall 1.0) and 3.16 ms for the variadic
sort. R*n_src is capped at 256 sublanes — wider tiles (R=8/16) regressed
to 4.5/5.4 ms (VMEM pressure defeats the pipeliner).

Exactness: the SELECTION is bit-stable — ascending distance, ties broken
by ascending target index (the stable sort's order), +inf for invalid
pairs — on the distances the kernel computes. Those distances are the same
sqrt(dx^2 + dy^2) as the XLA path but may differ from its lowering by
1 ULP (the compiler is free to FMA-contract dx*dx + dy*dy in one fusion
and not the other), the same caveat as the documented lazy/eager
equivalence in ops.rpe. On exactly-representable coordinates the outputs
are bit-identical to TB_KNN_IMPL=sort, ties included (tested). Contract:
coordinates must be finite (NaN distances would break the tie-break; the
packers guarantee this).

Layouts:
    src: [n_rows, n_src, 3]  f32 — (x, y, invalid ? +inf : 0)
    tgt: [n_rows, 3, n_tgt]  f32 — rows (x, y, invalid ? +inf : 0)
    out: dist [n_rows, n_src, k] f32, idx [n_rows, n_src, k] int32
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float("inf")

# trace-time mesh scope: GSPMD treats a tpu_custom_call as an opaque op and
# REPLICATES it (every device would compute the global KNN), so distributed
# steps wrap their step fn with `scoped_for_mesh` — the call site in
# ops.rpe then shard_maps the kernel over the mesh's data axis and each
# device runs it on its local scenario rows only.
_MESH_SCOPE = [None]


@contextlib.contextmanager
def knn_mesh_scope(mesh):
    """Declare the mesh whose data axis shards the scenario-row dim."""
    prev = _MESH_SCOPE[0]
    _MESH_SCOPE[0] = mesh
    try:
        yield
    finally:
        _MESH_SCOPE[0] = prev


def active_mesh():
    return _MESH_SCOPE[0]


def scoped_for_mesh(fn, mesh):
    """Wrap a to-be-jitted step fn so the KNN mesh scope is active while it
    traces (and harmlessly on cached calls)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with knn_mesh_scope(mesh):
            return fn(*args, **kwargs)

    return wrapped


def _knn_kernel(src_ref, tgt_ref, dist_out_ref, idx_out_ref, dist_scratch, *, k: int, rows: int):
    """A block of `rows` scenario-rows: their distance tiles stacked
    vertically in one VMEM scratch, then k min-extractions over the stack
    (every sublane row is an independent source, so stacking is exact)."""
    n_src = src_ref.shape[1]
    n_tgt = tgt_ref.shape[2]

    for r in range(rows):
        sx = src_ref[r, :, 0:1]  # [S, 1]
        sy = src_ref[r, :, 1:2]
        s_inf = src_ref[r, :, 2:3]
        tx = tgt_ref[r, 0:1, :]  # [1, T]
        ty = tgt_ref[r, 1:2, :]
        t_inf = tgt_ref[r, 2:3, :]
        dx = sx - tx
        dy = sy - ty
        # same math as get_rel_dist: norm then +inf at invalid pairs.
        # dist >= +0, so adding the 0/+inf flags preserves the finite values
        # bit-exactly. Selection runs on the int32 bit patterns: monotone for
        # non-negative floats, and TAKEN entries get 0x7FFFFFFF — strictly
        # greater than +inf's 0x7F800000, so rows with fewer than k valid
        # targets emit their +inf tail in ascending index order exactly like
        # the stable sort (an +inf re-mask would livelock on index 0).
        dist_scratch[r * n_src:(r + 1) * n_src, :] = jax.lax.bitcast_convert_type(
            jnp.sqrt(dx * dx + dy * dy) + s_inf + t_inf, jnp.int32
        )

    rs = rows * n_src
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (rs, n_tgt), 1)
    col_k = jax.lax.broadcasted_iota(jnp.int32, (rs, k), 1)

    def body(j, carry):
        out_d, out_i = carry
        d = dist_scratch[:]
        m = jnp.min(d, axis=1, keepdims=True)  # at most j < k <= n_tgt taken
        # first-index argmin == the stable sort's tie order
        idx = jnp.min(jnp.where(d == m, iota_t, n_tgt), axis=1, keepdims=True)
        out_d = jnp.where(col_k == j, m, out_d)
        out_i = jnp.where(col_k == j, idx, out_i)
        dist_scratch[:] = jnp.where(iota_t == idx, 0x7FFFFFFF, d)
        return out_d, out_i

    out_d = jnp.zeros((rs, k), jnp.int32)
    out_i = jnp.zeros((rs, k), jnp.int32)
    out_d, out_i = jax.lax.fori_loop(0, k, body, (out_d, out_i))
    dist_out_ref[:] = jax.lax.bitcast_convert_type(out_d, jnp.float32).reshape(rows, n_src, k)
    idx_out_ref[:] = out_i.reshape(rows, n_src, k)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_xy_pallas(
    src_xy: jnp.ndarray,
    src_invalid: jnp.ndarray,
    tgt_xy: jnp.ndarray,
    tgt_invalid: jnp.ndarray,
    k: int,
    interpret: bool = False,
):
    """(dist_knn, idx) of the k nearest targets per source, fused in VMEM.

    Args:
        src_xy: [n_rows, n_src, 2] f32
        src_invalid: [n_rows, n_src] bool
        tgt_xy: [n_rows, n_tgt, 2] f32
        tgt_invalid: [n_rows, n_tgt] bool
        k: static, 0 < k <= n_tgt

    Returns:
        dist_knn [n_rows, n_src, k] f32 (ascending, +inf for invalid pairs),
        idx [n_rows, n_src, k] int32 — the TB_KNN_IMPL=sort selection (stable
        tie order) over the kernel's distance tensor; see the module
        docstring for the 1-ULP FMA caveat vs the XLA lowering.
    """
    n_rows, n_src, _ = src_xy.shape
    n_tgt = tgt_xy.shape[1]
    assert 0 < k <= n_tgt, (k, n_tgt)

    src_xy = jax.lax.stop_gradient(src_xy).astype(jnp.float32)
    tgt_xy = jax.lax.stop_gradient(tgt_xy).astype(jnp.float32)
    src = jnp.concatenate(
        [src_xy, jnp.where(src_invalid, _INF, 0.0)[..., None].astype(jnp.float32)], axis=-1
    )
    tgt = jnp.concatenate(
        [tgt_xy, jnp.where(tgt_invalid, _INF, 0.0)[..., None].astype(jnp.float32)], axis=-1
    )
    tgt = jnp.swapaxes(tgt, -1, -2)  # [n_rows, 3, n_tgt]

    # rows per program: widest dependent steps without blowing VMEM — the
    # measured optimum is 256 stacked sublane rows (see module docstring)
    rows = 1
    for r in (8, 4, 2):
        if n_rows % r == 0 and r * n_src <= 256:
            rows = r
            break

    grid = (n_rows // rows,)
    kernel = functools.partial(_knn_kernel, k=k, rows=rows)
    dist_knn, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, n_src, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 3, n_tgt), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, n_src, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, n_src, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, n_src, k), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, n_src, k), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((rows * n_src, n_tgt), jnp.int32)],
        interpret=interpret,
    )(src, tgt)
    return dist_knn, idx


def pallas_knn_wanted(n_src: int, n_tgt: int) -> bool:
    """Shape gate + kill switch for the fused KNN (A/B: TB_KNN_PALLAS=0).

    DEFAULT ON for the shapes where it measured faster: the kernel pays off
    when the sort it replaces is wide (the in-scan ag2mp relation: 1024
    targets — whole-rollout 297.8k vs 281.9k agent-steps/s on v5e, +5.7%;
    train-mode neutral at 8 scenario-rows). At narrow n_tgt the XLA sort is
    already cheap and per-program work is too small. Lane-tiling guard:
    n_tgt must be a multiple of 128. The actual TPU-vs-other dispatch is
    lax.platform_dependent at the call site (ops.rpe.get_tgt_knn_lazy).
    """
    from trafficbotsv15_tpu.ops import flags

    if not flags.get().knn_pallas:
        return False
    return n_tgt >= 512 and n_tgt % 128 == 0 and n_src % 8 == 0
