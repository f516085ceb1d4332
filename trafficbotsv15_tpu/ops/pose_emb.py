"""Pose embeddings as pure functions.

Parity targets: /root/reference/src/utils/positional_emb.py (sinusoidal) and
/root/reference/src/utils/pose_emb.py (PoseEmb modes xy_dir / mpa_pl /
pe_xy_dir / pe_xy_yaw). These are parameter-free, so a pure-function design
keeps them trivially fusable by XLA and usable inside Pallas kernels.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PoseEmbConfig:
    """Static configuration for a pose embedding.

    mode: one of "xy_dir", "mpa_pl", "pe_xy_dir", "pe_xy_yaw".
    pe_dim: output dim for the sinusoidal modes.
    theta_xy / theta_cs: sinusoid bases (reference defaults 1e3 / 1e1).
    """

    mode: str
    pe_dim: int = 256
    theta_xy: float = 1e3
    theta_cs: float = 1e1


def pose_emb_out_dim(cfg: PoseEmbConfig) -> int:
    if cfg.mode == "xy_dir":
        return 4
    if cfg.mode == "mpa_pl":
        return 7
    if cfg.mode in ("pe_xy_dir", "pe_xy_yaw"):
        return cfg.pe_dim
    raise NotImplementedError(cfg.mode)


def sinusoid_embed(x: jnp.ndarray, dim: int, theta: float) -> jnp.ndarray:
    """Sinusoidal embedding: concat(cos(x*f), sin(x*f)), f_i = theta^(-2i/dim).

    Matches the reference PositionalEmbedding (positional_emb.py:6-26), where
    the repeat-interleaved frequency pairs reduce to this cos/sin concat.

    Args: x: [...]. Returns [..., dim].
    """
    assert dim % 2 == 0
    half = dim // 2
    exponents = jnp.arange(0, dim, 2, dtype=jnp.float32)[:half] / dim
    freqs = 1.0 / (theta**exponents)  # [half]
    ang = x[..., None].astype(jnp.float32) * freqs
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def sinusoid_embed_rad(x: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Angular sinusoidal embedding with integer frequencies 1..dim/2.

    Matches PositionalEmbeddingRad (positional_emb.py:29-54).
    Args: x: [...] in radians. Returns [..., dim].
    """
    assert dim % 2 == 0
    freqs = jnp.arange(1, dim // 2 + 1, dtype=jnp.float32)
    ang = x[..., None].astype(jnp.float32) * freqs
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def _as_cos_sin(direction: jnp.ndarray) -> jnp.ndarray:
    """dir [..., 1] (yaw) or [..., 2] (cos,sin) -> [..., 2] (cos,sin)."""
    if direction.shape[-1] == 1:
        yaw = direction[..., 0]
        return jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)
    return direction


def _as_yaw(direction: jnp.ndarray) -> jnp.ndarray:
    """dir [..., 1] (yaw) or [..., 2] (cos,sin) -> [...] yaw."""
    if direction.shape[-1] == 1:
        return direction[..., 0]
    return jnp.arctan2(direction[..., 1], direction[..., 0])


def pose_embed_xy_dir(xy: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    """Raw (x, y, cos, sin) features. Returns [..., 4]."""
    return jnp.concatenate([xy, _as_cos_sin(direction)], axis=-1)


def pose_embed_mpa_pl(xy: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    """MPA closest-point polyline geometry features, 7-dim.

    Treats (xy, direction) as segment start/vector relative to the agent and
    emits [r_norm, unit closest point (2), unit segment vec (2), segment len,
    dist to segment end] — see pose_emb.py:58-89.
    """
    direction = _as_cos_sin(direction)
    eps = jnp.finfo(xy.dtype).eps
    seg_start = xy
    seg_vec = direction
    proj = jnp.sum(-seg_start * seg_vec, axis=-1) / (jnp.sum(seg_vec * seg_vec, axis=-1) + eps)
    closest = seg_start + jnp.clip(proj, 0.0, 1.0)[..., None] * seg_vec
    r_norm = jnp.linalg.norm(closest, axis=-1, keepdims=True)
    seg_norm = jnp.linalg.norm(seg_vec, axis=-1, keepdims=True)
    end_dist = jnp.linalg.norm(seg_start + seg_vec - closest, axis=-1, keepdims=True)
    return jnp.concatenate(
        [r_norm, closest / (r_norm + eps), seg_vec / (seg_norm + eps), seg_norm, end_dist],
        axis=-1,
    )


def pose_embed_pe_xy_dir(
    xy: jnp.ndarray, direction: jnp.ndarray, pe_dim: int, theta_xy: float, theta_cs: float
) -> jnp.ndarray:
    """Sinusoidal embedding of (x, y, cos, sin), each pe_dim//4. Returns [..., pe_dim].

    Computed as ONE angle tensor + one cos + one sin + an interleave reshape
    (bit-identical values and feature order to the per-quantity
    sinusoid_embed concat, which materialized 8 small tensors and two concat
    passes — ~3 ms/step of VPU/bandwidth at flagship rollout shapes)."""
    direction = _as_cos_sin(direction)
    quarter = pe_dim // 4
    half = quarter // 2
    exponents = jnp.arange(0, quarter, 2, dtype=jnp.float32)[:half] / quarter
    f_xy = 1.0 / (theta_xy**exponents)
    f_cs = 1.0 / (theta_cs**exponents)
    freqs = jnp.stack([f_xy, f_xy, f_cs, f_cs])  # [4, half]
    q = jnp.concatenate([xy, direction], axis=-1).astype(jnp.float32)  # [..., 4]
    ang = q[..., :, None] * freqs  # [..., 4, half]
    emb = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-2)  # [..., 4, 2, half]
    return emb.reshape(q.shape[:-1] + (pe_dim,))


def pose_embed_pe_xy_yaw(xy: jnp.ndarray, direction: jnp.ndarray, pe_dim: int, theta_xy: float) -> jnp.ndarray:
    """Sinusoidal x/y (pe_dim//4 each) + angular yaw embedding (pe_dim//2)."""
    yaw = _as_yaw(direction)
    quarter = pe_dim // 4
    return jnp.concatenate(
        [
            sinusoid_embed(xy[..., 0], quarter, theta_xy),
            sinusoid_embed(xy[..., 1], quarter, theta_xy),
            sinusoid_embed_rad(yaw, pe_dim // 2),
        ],
        axis=-1,
    )


def apply_pose_emb(cfg: PoseEmbConfig, xy: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    """Dispatch on cfg.mode. xy: [..., 2], direction: yaw [..., 1] or cos/sin [..., 2]."""
    if cfg.mode == "xy_dir":
        return pose_embed_xy_dir(xy, direction)
    if cfg.mode == "mpa_pl":
        return pose_embed_mpa_pl(xy, direction)
    if cfg.mode == "pe_xy_dir":
        return pose_embed_pe_xy_dir(xy, direction, cfg.pe_dim, cfg.theta_xy, cfg.theta_cs)
    if cfg.mode == "pe_xy_yaw":
        return pose_embed_pe_xy_yaw(xy, direction, cfg.pe_dim, cfg.theta_xy)
    raise NotImplementedError(cfg.mode)
