"""SE(2) transform utilities as pure jnp functions.

Functional parity with the reference torch helpers
(/root/reference/src/utils/transform_utils.py:119-226), written for XLA:
everything is shape-polymorphic, broadcast-friendly and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def cast_rad(angle):
    """Wrap angles into the [-pi, pi) range."""
    return (angle + jnp.pi) % TWO_PI - jnp.pi


def rad2rot(rad: jnp.ndarray) -> jnp.ndarray:
    """Yaw angle(s) -> 2x2 rotation matrices, appended as trailing dims.

    Args:
        rad: [...]
    Returns:
        rot: [..., 2, 2] — rows [[cos, -sin], [sin, cos]].
    """
    c, s = jnp.cos(rad), jnp.sin(rad)
    row0 = jnp.stack([c, -s], axis=-1)
    row1 = jnp.stack([s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def sincos2rot(sin: jnp.ndarray, cos: jnp.ndarray) -> jnp.ndarray:
    """(sin, cos) pair -> 2x2 rotation matrices [..., 2, 2]."""
    row0 = jnp.stack([cos, -sin], axis=-1)
    row1 = jnp.stack([sin, cos], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def _rot_apply(d: jnp.ndarray, local_rot: jnp.ndarray, transpose: bool) -> jnp.ndarray:
    """Right-multiply [..., M, 2] vectors by [..., 2, 2] rotations.

    Written as explicit mul-adds (VPU) instead of jnp.matmul: tiny 2x2
    contractions would otherwise be padded onto the MXU and rounded to bf16
    on TPU, which is unacceptable for pose math at WOMD map scale (~1e2 m).
    """
    if transpose:
        r00, r01 = local_rot[..., None, 0, 0], local_rot[..., None, 1, 0]
        r10, r11 = local_rot[..., None, 0, 1], local_rot[..., None, 1, 1]
    else:
        r00, r01 = local_rot[..., None, 0, 0], local_rot[..., None, 0, 1]
        r10, r11 = local_rot[..., None, 1, 0], local_rot[..., None, 1, 1]
    x, y = d[..., 0], d[..., 1]
    return jnp.stack([x * r00 + y * r10, x * r01 + y * r11], axis=-1)


def pos2local(pos: jnp.ndarray, local_pos: jnp.ndarray, local_rot: jnp.ndarray) -> jnp.ndarray:
    """Transform M world points into a local frame.

    Args:
        pos: [..., M, 2] points in world frame
        local_pos: [..., 1, 2] local frame origin
        local_rot: [..., 2, 2] local frame rotation (world->local uses right-multiply)
    Returns:
        [..., M, 2]
    """
    return _rot_apply(pos - local_pos, local_rot, transpose=False)


def pos2global(pos: jnp.ndarray, local_pos: jnp.ndarray, local_rot: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pos2local`."""
    return _rot_apply(pos, local_rot, transpose=True) + local_pos


def dir2local(d: jnp.ndarray, local_rot: jnp.ndarray) -> jnp.ndarray:
    """Rotate direction vectors into a local frame. d: [..., M, 2]."""
    return _rot_apply(d, local_rot, transpose=False)


def dir2global(d: jnp.ndarray, local_rot: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`dir2local`."""
    return _rot_apply(d, local_rot, transpose=True)


def rad2local(rad: jnp.ndarray, local_rad: jnp.ndarray, cast: bool = True) -> jnp.ndarray:
    """Angles [..., M] minus frame yaw [...]; optionally wrapped to [-pi, pi)."""
    out = rad - local_rad[..., None]
    return cast_rad(out) if cast else out


def rad2global(rad: jnp.ndarray, local_rad: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`rad2local` (always wraps)."""
    return cast_rad(rad + local_rad[..., None])
