"""Relative pose and KNN target selection.

Parity target: /root/reference/src/utils/rpe.py (get_rel_pose, get_rel_dist,
get_tgt_knn_idx). All functions run under stop_gradient (the reference wraps
them in torch.no_grad) and use static shapes so they compile once inside the
rollout scan. top_k runs on the negated distance — XLA lowers this to a fast
TPU sort over the fixed-size target axis.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from trafficbotsv15_tpu.ops.transform import pos2local, rad2local, rad2rot

_INF = jnp.inf


def _knn_select(rel_dist: jnp.ndarray, k: int):
    """(dist_knn, idx) of the k smallest distances along the last axis.

    Default (TB_KNN_IMPL=partial): exact-SET top-k via the TPU ApproxTopK
    custom call at recall_target=1.0 — see the inline comment.
    TB_KNN_IMPL=sort: the full-width stable variadic sort (bit-stable tie
    order). TB_APPROX_KNN=1: lax.approx_min_k at recall 0.99 per element —
    an agent may rarely see its ~65th-nearest polyline instead of the 64th;
    measure before enabling for submissions.
    """
    from trafficbotsv15_tpu.ops import flags

    fl = flags.get()
    if fl.approx_knn:
        return jax.lax.approx_min_k(rel_dist, k, recall_target=0.99, aggregate_to_topk=True)
    if fl.knn_impl == "partial":
        # EXACT-set top-k through the TPU ApproxTopK custom call (the
        # DEFAULT): at recall_target=1.0 XLA performs NO partial reduction
        # (reduction output size == input size), so this returns exactly the
        # k smallest distances — only the tie-break order among bit-equal
        # distances may differ from the stable sort (the reference's
        # torch.topk tie order is arbitrary too). Measured +2.6% whole-
        # rollout on v5e over the variadic sort (3.35 vs 4.0 ms standalone
        # at [128,64,1024]); TB_KNN_IMPL=sort restores the stable sort.
        return jax.lax.approx_min_k(rel_dist, k, recall_target=1.0, aggregate_to_topk=True)
    n = rel_dist.shape[-1]
    chunk = 128
    if fl.two_stage_knn and n > 2 * chunk and n % chunk == 0 and k <= chunk:
        # EXACT two-stage top-k: per-128-chunk top-k, then top-k of the
        # g*k candidates (bit-exact incl. tie order, tested). Kept for the
        # record: measured a large REGRESSION on v5e (143.6k vs 273.3k at
        # batch 4) — the chunked [.., g, 128] view forces layout copies of
        # the distance tensor that dwarf the shorter sorts. Default OFF.
        g = n // chunk
        d = rel_dist.reshape(rel_dist.shape[:-1] + (g, chunk))
        neg_dk, ik = jax.lax.top_k(-d, k)  # [..., g, k]
        ik = ik + (jnp.arange(g, dtype=ik.dtype) * chunk)[:, None]
        cand_d = neg_dk.reshape(rel_dist.shape[:-1] + (g * k,))
        cand_i = ik.reshape(rel_dist.shape[:-1] + (g * k,))
        neg_dist, sel = jax.lax.top_k(cand_d, k)
        idx = jnp.take_along_axis(cand_i, sel, axis=-1)
        return -neg_dist, idx
    neg_dist, idx = jax.lax.top_k(-rel_dist, k)
    return -neg_dist, idx


def get_rel_pose(
    pose: jnp.ndarray,
    invalid: jnp.ndarray,
    pose2: Optional[jnp.ndarray] = None,
    invalid2: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pairwise relative poses: target j expressed in the frame of source i.

    Args:
        pose: [n_sc, n_src, 3] (x, y, yaw) global
        invalid: [n_sc, n_src] bool
        pose2/invalid2: targets; defaults to (pose, invalid) for self-pairs.

    Returns:
        rel_pose: [n_sc, n_src, n_tgt, 3] (dx, dy, dyaw) in source frames
        rel_dist: [n_sc, n_src, n_tgt], +inf where either end is invalid
    """
    pose = jax.lax.stop_gradient(pose)
    if pose2 is None:
        pose2, invalid2 = pose, invalid
    else:
        pose2 = jax.lax.stop_gradient(pose2)

    xy, yaw = pose[..., :2], pose[..., 2]
    xy2, yaw2 = pose2[..., :2], pose2[..., 2]
    local_xy = pos2local(xy2[:, None, :, :], xy[:, :, None, :], rad2rot(yaw))
    local_yaw = rad2local(yaw2[:, None, :], yaw, cast=False)
    rel_pose = jnp.concatenate([local_xy, local_yaw[..., None]], axis=-1)
    rel_dist = jnp.linalg.norm(rel_pose[..., :2], axis=-1)
    rel_dist = jnp.where(invalid[:, :, None] | invalid2[:, None, :], _INF, rel_dist)
    return rel_pose, rel_dist


def get_rel_dist(
    xy: jnp.ndarray,
    invalid: jnp.ndarray,
    xy2: Optional[jnp.ndarray] = None,
    invalid2: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Pairwise euclidean distances [n_sc, n_src, n_tgt], +inf where invalid."""
    xy = jax.lax.stop_gradient(xy)
    if xy2 is None:
        xy2, invalid2 = xy, invalid
    else:
        xy2 = jax.lax.stop_gradient(xy2)
    rel_dist = jnp.linalg.norm(xy[:, :, None, :] - xy2[:, None, :, :], axis=-1)
    return jnp.where(invalid[:, :, None] | invalid2[:, None, :], _INF, rel_dist)


def _tag_knn(idx_tgt, tgt_invalid_knn, rpe):
    """checkpoint_name tags for remat_policy="names": the KNN selection is
    stop-gradient and its exact-sort top-k is one of the most expensive ops of
    the rollout step — saving these tiny outputs lets the BPTT replay skip the
    whole distance + sort recomputation (no-op outside jax.checkpoint)."""
    from jax.ad_checkpoint import checkpoint_name

    idx_tgt = checkpoint_name(idx_tgt, "knn_idx")
    tgt_invalid_knn = checkpoint_name(tgt_invalid_knn, "knn_invalid")
    if rpe is not None:
        rpe = checkpoint_name(rpe, "knn_rpe")
    return idx_tgt, tgt_invalid_knn, rpe


def get_tgt_knn(
    tgt_invalid: jnp.ndarray,
    rel_pose: Optional[jnp.ndarray],
    rel_dist: jnp.ndarray,
    n_tgt_knn: int,
    dist_limit,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Select the K nearest valid targets per source.

    CONTRACT: rel_dist MUST carry +inf for every invalid pair (get_rel_pose /
    get_rel_dist guarantee this) — winner validity is derived from the top-k
    VALUES alone; the tgt_invalid argument is kept for signature parity with
    the reference (rpe.py:63-90) but is NOT consulted. A rel_dist produced
    any other way must bake its own masking in.

    Args:
        tgt_invalid: [n_sc, n_tgt] bool (unused; see contract above)
        rel_pose: [n_sc, n_src, n_tgt, 3] or None
        rel_dist: [n_sc, n_src, n_tgt] (+inf marks invalid pairs)
        n_tgt_knn: static K, 0 < K < n_tgt
        dist_limit: float or broadcastable array; pairs beyond it are masked.

    Returns:
        idx_tgt: [n_sc, n_src, K] int32
        tgt_invalid_knn: [n_sc, n_src, K] bool
        rpe: [n_sc, n_src, K, 3] or None
    """
    n_tgt = rel_dist.shape[-1]
    assert 0 < n_tgt_knn < n_tgt, (n_tgt_knn, n_tgt)

    dist_knn, idx_tgt = _knn_select(rel_dist, n_tgt_knn)  # [n_sc, n_src, K]

    # contract: rel_dist is +inf wherever src or tgt is invalid (get_rel_pose /
    # get_rel_dist guarantee it), so the winners' validity falls out of the
    # top-k values — no bool gather needed (that gather was the single most
    # expensive op of the rollout step, 3.7 ms at flagship shapes).
    tgt_invalid_knn = dist_knn > dist_limit

    rpe = None
    if rel_pose is not None:
        rpe = jnp.take_along_axis(rel_pose, idx_tgt[..., None], axis=2)
    return _tag_knn(idx_tgt.astype(jnp.int32), tgt_invalid_knn, rpe)


def get_tgt_knn_lazy(
    src_pose: jnp.ndarray,
    src_invalid: jnp.ndarray,
    tgt_pose: jnp.ndarray,
    tgt_invalid: jnp.ndarray,
    n_tgt_knn: int,
    dist_limit,
    tgt_rep: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """get_rel_pose + get_tgt_knn fused, with SE(2) math on the K winners only.

    Euclidean distance is rotation-invariant, so the KNN selection runs on
    global-frame deltas ([n_src, n_tgt] subtract+norm, no sin/cos); the
    local-frame relative poses are then computed for the K selected targets
    — O(n_src*K) instead of O(n_src*n_tgt) rotation math, and the
    [n_src, n_tgt, 3] rel_pose tensor is never materialized. Numerically
    equivalent to the eager pair up to distance-tie ordering.

    tgt_rep > 1: the targets are static tokens shared by tgt_rep consecutive
    source rows (the K-futures WOSAC workload replicates each scenario's map
    K times) — tgt_pose/tgt_invalid then carry the UNIQUE scenarios
    [n_sc // tgt_rep, n_tgt, ...]. Selection runs on a virtual broadcast
    (values identical per row, so bit-identical results); the K-winner pose
    gather reads the small unique tensor instead of a K-times replicated one
    (docs/PERF.md chain12).

    Returns (idx_tgt [n_sc,n_src,K] int32, tgt_invalid_knn [n_sc,n_src,K],
    rpe [n_sc,n_src,K,3]).
    """
    src_pose = jax.lax.stop_gradient(src_pose)
    tgt_pose = jax.lax.stop_gradient(tgt_pose)
    tgt_pose_u = tgt_pose  # unique targets (== tgt_pose when tgt_rep == 1)
    if tgt_rep > 1:
        n_u = tgt_pose.shape[0]
        assert src_pose.shape[0] == n_u * tgt_rep, (src_pose.shape, n_u, tgt_rep)
        rep = lambda x: jnp.broadcast_to(
            x[:, None], (n_u, tgt_rep) + x.shape[1:]
        ).reshape((n_u * tgt_rep,) + x.shape[1:])
        tgt_pose = rep(tgt_pose)
        tgt_invalid = rep(tgt_invalid)
    src_xy, src_yaw = src_pose[..., :2], src_pose[..., 2]
    tgt_xy = tgt_pose[..., :2]

    from trafficbotsv15_tpu.ops.pallas_knn import knn_xy_pallas, pallas_knn_wanted

    if pallas_knn_wanted(src_xy.shape[1], tgt_xy.shape[1]):
        # fused Pallas distance+top-k: the [n_src, n_tgt] distance tile stays
        # in VMEM (never HBM) and the k smallest are extracted without the
        # full variadic sort. Stable-sort selection semantics; distances may
        # differ from the XLA lowering by 1 ULP (FMA) — see ops.pallas_knn.
        def _xla_knn(sxy, sinv, txy, tinv):
            rd = jnp.linalg.norm(sxy[:, :, None, :] - txy[:, None, :, :], axis=-1)
            rd = jnp.where(sinv[:, :, None] | tinv[:, None, :], _INF, rd)
            d, i = _knn_select(rd, n_tgt_knn)  # approx_min_k yields a LIST
            return d, i

        def _tpu_knn(sxy, sinv, txy, tinv):
            from trafficbotsv15_tpu.ops.pallas_knn import active_mesh
            from trafficbotsv15_tpu.parallel.mesh import DATA_AXIS

            mesh = active_mesh()
            if (mesh is not None and mesh.size > 1
                    and sxy.shape[0] % mesh.shape[DATA_AXIS] != 0):
                return _xla_knn(sxy, sinv, txy, tinv)  # unshardable rows
            if mesh is not None and mesh.size > 1:
                # GSPMD replicates opaque custom calls — shard_map the kernel
                # over the data axis so each device selects for its own rows
                from jax.experimental.shard_map import shard_map
                from jax.sharding import PartitionSpec as P

                spec = P(DATA_AXIS)
                d, i = shard_map(
                    lambda a, b, c, e: knn_xy_pallas(a, b, c, e, n_tgt_knn),
                    mesh=mesh,
                    in_specs=(spec, spec, spec, spec),
                    out_specs=(spec, spec),
                    check_rep=False,
                )(sxy, sinv, txy, tinv)
                return d, i
            d, i = knn_xy_pallas(sxy, sinv, txy, tinv, n_tgt_knn)
            return d, i

        dist_knn, idx_tgt = jax.lax.platform_dependent(
            src_xy, src_invalid, tgt_xy, tgt_invalid,
            tpu=_tpu_knn,
            default=_xla_knn,
        )
    else:
        rel_dist = jnp.linalg.norm(src_xy[:, :, None, :] - tgt_xy[:, None, :, :], axis=-1)
        rel_dist = jnp.where(src_invalid[:, :, None] | tgt_invalid[:, None, :], _INF, rel_dist)

        dist_knn, idx_tgt = _knn_select(rel_dist, n_tgt_knn)
    # invalid pairs carry dist=inf, so validity falls out of the top-k values
    tgt_invalid_knn = dist_knn > dist_limit

    # routed through gather_tgt: no backward concern (stop_gradient), but the
    # native row gather runs ~30 GB/s inside the rollout scan body — inside
    # onehot_gather_scope the one-hot matmul variant is used for speed.
    # With tgt_rep > 1 the gather reads the unique-scenario pose tensor.
    tgt_pose_knn = gather_tgt(tgt_pose_u, idx_tgt, tgt_rep=tgt_rep)
    local_xy = pos2local(tgt_pose_knn[..., :2], src_xy[:, :, None, :], rad2rot(src_yaw))
    local_yaw = rad2local(tgt_pose_knn[..., 2], src_yaw, cast=False)
    rpe = jnp.concatenate([local_xy, local_yaw[..., None]], axis=-1)
    return _tag_knn(idx_tgt.astype(jnp.int32), tgt_invalid_knn, rpe)


_ONEHOT_GATHER_SCOPE = [False]


@contextlib.contextmanager
def onehot_gather_scope(enabled: bool = True):
    """Trace-time scope: route gather_tgt through the one-hot matmul variant.

    The backward pass of a plain gather is a TPU scatter-add, which serializes
    and dominates BPTT through the rollout scan (hundreds of scatters across
    90 steps). Inside this scope gathers become one-hot matmuls whose backward
    is a matmul (ride the MXU). Used by sim.rollout for training rollouts;
    forward-only code keeps the cheap gather.
    """
    prev = _ONEHOT_GATHER_SCOPE[0]
    _ONEHOT_GATHER_SCOPE[0] = enabled
    try:
        yield
    finally:
        _ONEHOT_GATHER_SCOPE[0] = prev


def gather_tgt(feature: jnp.ndarray, idx_tgt: jnp.ndarray, tgt_rep: int = 1) -> jnp.ndarray:
    """Gather per-source target features.

    Args:
        feature: [n_sc, n_tgt, d] — or the UNIQUE scenarios
            [n_sc // tgt_rep, n_tgt, d] when tgt_rep > 1 (K-futures dedup:
            each unique scenario's static tokens serve tgt_rep consecutive
            source rows; the gather then reads a K-times smaller tensor).
        idx_tgt: [n_sc, n_src, K]
    Returns:
        [n_sc, n_src, K, d]

    Inside onehot_gather_scope the one-hot
    matmul variant is used (scatter-free backward) — including for the
    narrow [.., 3] rel-pose gather: although the one-hot matmul does ~40x
    the arithmetic of a row gather at width 3, routing the pose gather
    through the native gather measured a 15% whole-rollout REGRESSION
    (232.4k vs 273.6k agent-steps/s at batch 4) — the TPU gather engine
    inside the big scan body is far slower than the profile's 0.66 ms
    one-hot cost. TB_NARROW_GATHER_NATIVE=1 re-enables that routing for
    future A/Bs (e.g. if the scan body shrinks).
    """
    if tgt_rep > 1:
        n_u = feature.shape[0]
        n_sc, n_src, k = idx_tgt.shape
        assert n_sc == n_u * tgt_rep, (feature.shape, idx_tgt.shape, tgt_rep)
        out = gather_tgt(feature, idx_tgt.reshape(n_u, tgt_rep * n_src, k))
        return out.reshape(n_sc, n_src, k, feature.shape[-1])
    if _ONEHOT_GATHER_SCOPE[0]:
        from trafficbotsv15_tpu.ops import flags

        if feature.shape[-1] > 8 or not flags.get().narrow_gather_native:
            return gather_tgt_onehot(feature, idx_tgt)
    n_sc, n_src, k = idx_tgt.shape
    flat = idx_tgt.reshape(n_sc, n_src * k)
    out = jnp.take_along_axis(feature, flat[..., None], axis=1)
    return out.reshape(n_sc, n_src, k, feature.shape[-1])


def gather_tgt_onehot(feature: jnp.ndarray, idx_tgt: jnp.ndarray) -> jnp.ndarray:
    """Gather implemented as a one-hot matmul (MXU).

    Same result as :func:`gather_tgt` but the backward pass is a matmul
    instead of a scatter-add — TPU scatters serialize and dominate the BPTT
    backward when the rollout gathers K/V per step. Extra forward FLOPs ride
    the idle MXU. Use inside differentiated rollouts; plain gather elsewhere.
    """
    n_sc, n_src, k = idx_tgt.shape
    n_tgt = feature.shape[1]
    onehot = jax.nn.one_hot(idx_tgt.reshape(n_sc, n_src * k), n_tgt, dtype=feature.dtype)
    out = jnp.einsum("bst,btd->bsd", onehot, feature)
    return out.reshape(n_sc, n_src, k, feature.shape[-1])
