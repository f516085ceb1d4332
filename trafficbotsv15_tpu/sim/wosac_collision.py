"""WOSAC-exact collision check (corner-rounded boxes + Minkowski sum +
signed point-to-convex-polygon distance).

Parity target: /root/reference/src/utils/wosac_collision.py, itself a port of
Waymo's differentiable-geometry collision metric.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

EXTREMELY_LARGE_DISTANCE = 1e10
COLLISION_DISTANCE_THRESHOLD = 0.0
CORNER_ROUNDING_FACTOR = 0.7


def get_ag_bbox(pose: jnp.ndarray, ag_size: jnp.ndarray) -> jnp.ndarray:
    """Counter-clockwise box corners.

    pose: [n_sc, n_ag, 3]; ag_size: [n_sc, n_ag, 2] (length, width).
    Returns [n_sc, n_ag, 4, 2].
    """
    c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
    heading_f = jnp.stack([c, s], axis=-1)
    heading_r = jnp.stack([s, -c], axis=-1)
    off_f = 0.5 * ag_size[..., 0:1] * heading_f
    off_r = 0.5 * ag_size[..., 1:2] * heading_r
    corners = jnp.stack([off_f - off_r, -off_f - off_r, -off_f + off_r, off_f + off_r], axis=2)
    return pose[:, :, None, :2] + corners


def _edge_info(poly: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    shifted = jnp.roll(poly, -1, axis=2)
    edge = shifted - poly
    length = jnp.linalg.norm(edge, axis=-1)
    tangent = edge / (length[..., None] + 1e-12)
    normal = jnp.stack([-tangent[..., 1], tangent[..., 0]], axis=-1)
    return tangent, normal, length


def signed_distance_point_to_polygon(query: jnp.ndarray, poly: jnp.ndarray) -> jnp.ndarray:
    """query: [n_sc, n_poly, 2]; poly (ccw): [n_sc, n_poly, n_pt, 2] -> [n_sc, n_poly]."""
    tangent, normal, length = _edge_info(poly)
    v2q = query[:, :, None, :] - poly
    vert_dist = jnp.linalg.norm(v2q, axis=-1)
    perp = jnp.sum(-normal * v2q, axis=-1)
    is_inside = jnp.all(perp <= 0, axis=-1)
    proj = jnp.sum(tangent * v2q, axis=-1) / (length + 1e-12)
    on_edge = (proj >= 0.0) & (proj <= 1.0)
    edge_dist = jnp.where(on_edge, jnp.abs(perp), EXTREMELY_LARGE_DISTANCE)
    min_dist = jnp.min(jnp.concatenate([edge_dist, vert_dist], axis=-1), axis=-1)
    return jnp.where(is_inside, -min_dist, min_dist)


def _select_corners(box: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """box [n_sc, n_box, 4, 2] selected at idx [n_sc, n_box, K] -> [n_sc, n_box, K, 2].

    One-hot einsum instead of take_along_axis: per-pair corner gathers were
    ~44% of the whole rollout on TPU (badly-tiled f32[·,2] scalar-memory
    gather fusions in the profile); the 4-wide one-hot contraction is a
    dense VPU op.
    """
    oh = jax.nn.one_hot(idx, 4, dtype=box.dtype)  # [n_sc, n_box, K, 4]
    return jnp.einsum("sbkc,sbcx->sbkx", oh, box)


def _downmost_edge(box: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """box: [n_sc, n_box, 4, 2] -> (downmost vertex idx [n_sc, n_box, 1], its edge dir [n_sc, n_box, 1, 2])."""
    idx = jnp.argmin(box[..., 1], axis=-1)[..., None]
    pts = _select_corners(box, jnp.concatenate([idx, (idx + 1) % 4], axis=-1))
    edge = pts[:, :, 1:2] - pts[:, :, 0:1]
    return idx, edge / (jnp.linalg.norm(edge, axis=-1, keepdims=True) + 1e-12)


def minkowski_sum_boxes(box1: jnp.ndarray, box2: jnp.ndarray) -> jnp.ndarray:
    """Minkowski sum of two ccw boxes -> ccw octagon [n_sc, n_box, 8, 2]."""
    order1 = jnp.asarray([0, 0, 1, 1, 2, 2, 3, 3])
    order2 = jnp.asarray([0, 1, 1, 2, 2, 3, 3, 0])
    idx1, dir1 = _downmost_edge(box1)
    idx2, dir2 = _downmost_edge(box2)
    cond = (dir1[..., 0] * dir2[..., 1] - dir1[..., 1] * dir2[..., 0]) >= 0.0  # [n_sc, n_box, 1]
    o1 = jnp.where(cond, order2[None, None], order1[None, None])
    o2 = jnp.where(cond, order1[None, None], order2[None, None])
    p1 = _select_corners(box1, (o1 + idx1) % 4)
    p2 = _select_corners(box2, (o2 + idx2) % 4)
    return p1 + p2


def _downmost_edge_soa(x: jnp.ndarray, y: jnp.ndarray):
    """x, y: [n_sc, 4, P] ccw corners -> (idx [n_sc, P], dir_x, dir_y [n_sc, P])."""
    idx = jnp.argmin(y, axis=1)
    oh = jax.nn.one_hot(idx, 4, dtype=x.dtype, axis=1)  # [n_sc, 4, P]
    oh_next = jnp.roll(oh, 1, axis=1)  # one_hot((idx + 1) % 4)
    sx = jnp.sum(oh * x, axis=1)
    sy = jnp.sum(oh * y, axis=1)
    ex = jnp.sum(oh_next * x, axis=1)
    ey = jnp.sum(oh_next * y, axis=1)
    dx, dy = ex - sx, ey - sy
    norm = jnp.sqrt(dx * dx + dy * dy) + 1e-12
    return idx, dx / norm, dy / norm


def _minkowski_sum_soa(x1, y1, x2, y2):
    """Minkowski sum in structure-of-arrays form.

    x1, y1, x2, y2: [n_sc, 4, P] ccw corners of the two boxes per pair.
    Returns octagon (px, py): [n_sc, 8, P].
    """
    order1 = jnp.asarray([0, 0, 1, 1, 2, 2, 3, 3])
    order2 = jnp.asarray([0, 1, 1, 2, 2, 3, 3, 0])
    idx1, d1x, d1y = _downmost_edge_soa(x1, y1)
    idx2, d2x, d2y = _downmost_edge_soa(x2, y2)
    cond = (d1x * d2y - d1y * d2x) >= 0.0  # [n_sc, P]
    o1 = jnp.where(cond[:, None, :], order2[None, :, None], order1[None, :, None])  # [n_sc, 8, P]
    o2 = jnp.where(cond[:, None, :], order1[None, :, None], order2[None, :, None])
    sel1 = jax.nn.one_hot((o1 + idx1[:, None, :]) % 4, 4, dtype=x1.dtype, axis=2)  # [n_sc, 8, 4, P]
    sel2 = jax.nn.one_hot((o2 + idx2[:, None, :]) % 4, 4, dtype=x1.dtype, axis=2)
    px = jnp.sum(sel1 * x1[:, None], axis=2) + jnp.sum(sel2 * x2[:, None], axis=2)
    py = jnp.sum(sel1 * y1[:, None], axis=2) + jnp.sum(sel2 * y2[:, None], axis=2)
    return px, py


def _signed_distance_origin_soa(px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """Signed distance of the origin to ccw polygons (px, py [n_sc, n_pt, P])."""
    sx, sy = jnp.roll(px, -1, axis=1), jnp.roll(py, -1, axis=1)
    ex_, ey_ = sx - px, sy - py
    length = jnp.sqrt(ex_ * ex_ + ey_ * ey_)
    tx, ty = ex_ / (length + 1e-12), ey_ / (length + 1e-12)
    nx, ny = -ty, tx
    # vertex-to-query vectors with query = origin: v2q = -p
    vert_dist = jnp.sqrt(px * px + py * py)
    perp = nx * px + ny * py  # sum(-normal * v2q)
    is_inside = jnp.all(perp <= 0, axis=1)
    proj = -(tx * px + ty * py) / (length + 1e-12)
    on_edge = (proj >= 0.0) & (proj <= 1.0)
    edge_dist = jnp.where(on_edge, jnp.abs(perp), EXTREMELY_LARGE_DISTANCE)
    min_dist = jnp.minimum(jnp.min(edge_dist, axis=1), jnp.min(vert_dist, axis=1))
    return jnp.where(is_inside, -min_dist, min_dist)


def pairwise_signed_distance_soa(pose: jnp.ndarray, ag_size: jnp.ndarray,
                                 valid: jnp.ndarray) -> jnp.ndarray:
    """Corner-rounded pairwise signed distances [n_sc, n_ag, n_ag] (WOSAC
    geometry, wosac_collision.py:196-239 before thresholding).

    pose [n_sc, n_ag, 3]; ag_size [n_sc, n_ag, >=2]; valid [n_sc, n_ag].

    Runs in structure-of-arrays form with the pair axis minor: the per-pair
    geometry is all elementwise math on [n_sc, n_corner, n_ag*n_ag] planes,
    which tiles the TPU's (8, 128) vector registers fully. The AoS layout
    ([n_pair, 4, 2] with a 2-wide minor dim) left 98% of the lanes idle and
    made this check ~1/3 of the whole rollout (and 16-32x HBM padding when
    batched over rollouts x steps for the realism features).
    """
    n_sc, n_ag, _ = pose.shape
    shrink = jnp.minimum(ag_size[..., 0], ag_size[..., 1]) * CORNER_ROUNDING_FACTOR / 2.0
    corners = get_ag_bbox(pose, ag_size[..., :2] - 2.0 * shrink[..., None])  # [n_sc, n_ag, 4, 2]
    cx, cy = corners[..., 0], corners[..., 1]  # [n_sc, n_ag, 4]

    def pair(a, as_eval):  # [n_sc, n_ag, 4] -> [n_sc, 4, n_ag*n_ag]
        if as_eval:
            out = jnp.broadcast_to(a[:, :, None, :], (n_sc, n_ag, n_ag, 4))
        else:
            out = jnp.broadcast_to(a[:, None, :, :], (n_sc, n_ag, n_ag, 4))
        return jnp.moveaxis(out.reshape(n_sc, n_ag * n_ag, 4), 1, 2)

    x1, y1 = pair(cx, True), pair(cy, True)
    x2, y2 = -pair(cx, False), -pair(cy, False)  # second box negated (Minkowski difference)
    px, py = _minkowski_sum_soa(x1, y1, x2, y2)
    sd = _signed_distance_origin_soa(px, py).reshape(n_sc, n_ag, n_ag)
    sd = sd - shrink[:, None, :] - shrink[:, :, None]
    invalid = ~(valid[:, :, None] & valid[:, None, :]) | jnp.eye(n_ag, dtype=bool)[None]
    return jnp.where(invalid, EXTREMELY_LARGE_DISTANCE, sd)


def check_collided_wosac(pose: jnp.ndarray, ag_size: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Exact WOSAC collision flag per agent (wosac_collision.py:196-239)."""
    sd = pairwise_signed_distance_soa(pose, ag_size, valid)
    return jnp.min(sd, axis=2) < COLLISION_DISTANCE_THRESHOLD
