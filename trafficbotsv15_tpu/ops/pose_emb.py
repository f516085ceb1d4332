"""Pose embeddings as pure functions.

Parity targets: /root/reference/src/utils/positional_emb.py (sinusoidal) and
/root/reference/src/utils/pose_emb.py (PoseEmb modes xy_dir / mpa_pl /
pe_xy_dir / pe_xy_yaw). These are parameter-free, so a pure-function design
keeps them trivially fusable by XLA and usable inside Pallas kernels.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as _np


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


def _pe_xy_dir_tables(pe_dim: int, theta_xy: float, theta_cs: float):
    """Static per-output-slot tables for the flat pe_xy_dir formulation.

    Returns (fvec [4, pe_dim] f32 jnp constants, sin_mask [pe_dim] bool
    numpy), where slot j of quantity block qi carries frequency fvec[qi, j]
    (zero outside its block) and sin_mask marks the sin half of each block —
    the exact feature order of the stack([cos, sin], -2).reshape interleave.
    The frequencies are computed with the same jnp f32 ops as the stacked
    form so the angle products stay bit-identical; the masks are exact
    0/1 factors, constant-folded by XLA."""
    quarter = pe_dim // 4
    half = quarter // 2
    exponents = jnp.arange(0, quarter, 2, dtype=jnp.float32)[:half] / quarter
    f_xy = 1.0 / (theta_xy**exponents)
    f_cs = 1.0 / (theta_cs**exponents)
    fflat = jnp.concatenate([f_xy] * 4 + [f_cs] * 4)  # [pe_dim]
    qmask = _np.zeros((4, pe_dim), _np.float32)
    sin_mask = _np.zeros((pe_dim,), bool)
    for qi in range(4):
        qmask[qi, qi * quarter : (qi + 1) * quarter] = 1.0
        sin_mask[qi * quarter + half : (qi + 1) * quarter] = True
    fvec = fflat[None, :] * qmask  # [4, pe_dim]
    return fvec, sin_mask


def pose_embed_pe_xy_dir(
    xy: jnp.ndarray, direction: jnp.ndarray, pe_dim: int, theta_xy: float, theta_cs: float
) -> jnp.ndarray:
    """Sinusoidal embedding of (x, y, cos, sin), each pe_dim//4. Returns [..., pe_dim].

    Default: ONE [..., 4, half] angle tensor + one cos + one sin + interleave
    reshape (bit-identical values/order to the per-quantity sinusoid_embed
    concat). TB_POSE_EMB_FLAT=1 switches to a flat [..., pe_dim] formulation
    (angle = sum of per-quantity broadcasts against zero-padded frequency
    vectors, cos/sin via lane select) — bit-identical, but measured a 16%
    whole-rollout REGRESSION on v5e (230.3k vs 273.6k agent-steps/s): the
    select needs BOTH sin and cos over all pe_dim slots, doubling the
    transcendental work the stacked form does on the half-width angle
    tensor. Kept for shapes where layout (not VPU) dominates."""
    from trafficbotsv15_tpu.ops import flags

    direction = _as_cos_sin(direction)
    q = jnp.concatenate([xy, direction], axis=-1).astype(jnp.float32)  # [..., 4]
    if not flags.get().pose_emb_flat:
        quarter = pe_dim // 4
        half = quarter // 2
        exponents = jnp.arange(0, quarter, 2, dtype=jnp.float32)[:half] / quarter
        f_xy = 1.0 / (theta_xy**exponents)
        f_cs = 1.0 / (theta_cs**exponents)
        freqs = jnp.stack([f_xy, f_xy, f_cs, f_cs])  # [4, half]
        ang = q[..., :, None] * freqs  # [..., 4, half]
        emb = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-2)  # [..., 4, 2, half]
        return emb.reshape(q.shape[:-1] + (pe_dim,))
    fvec, sin_mask = _pe_xy_dir_tables(pe_dim, theta_xy, theta_cs)
    ang = (
        q[..., 0:1] * fvec[0]
        + q[..., 1:2] * fvec[1]
        + q[..., 2:3] * fvec[2]
        + q[..., 3:4] * fvec[3]
    )  # [..., pe_dim]
    return jnp.where(jnp.asarray(sin_mask), jnp.sin(ang), jnp.cos(ang))


def _pe_xy_yaw_tables(pe_dim: int, theta_xy: float):
    """Static tables for the flat pe_xy_yaw formulation: (fvec [3, pe_dim]
    f32 jnp constants, sin_mask [pe_dim] bool numpy). Slot layout matches
    the sinusoid_embed/sinusoid_embed_rad concat exactly: x block
    [cos|sin] (pe_dim//4), y block (pe_dim//4), yaw block [cos|sin]
    (pe_dim//2, integer frequencies). Frequencies use the same jnp f32 ops
    as the per-quantity embeds, so angle products are bit-identical."""
    quarter = pe_dim // 4
    qh = quarter // 2
    half = pe_dim // 2
    hh = half // 2
    exponents = jnp.arange(0, quarter, 2, dtype=jnp.float32)[:qh] / quarter
    f_xy = 1.0 / (theta_xy**exponents)  # [qh]
    f_rad = jnp.arange(1, hh + 1, dtype=jnp.float32)  # [hh]
    fflat = jnp.concatenate([f_xy, f_xy, f_xy, f_xy, f_rad, f_rad])  # [pe_dim]
    qmask = _np.zeros((3, pe_dim), _np.float32)
    sin_mask = _np.zeros((pe_dim,), bool)
    qmask[0, :quarter] = 1.0
    qmask[1, quarter : 2 * quarter] = 1.0
    qmask[2, 2 * quarter :] = 1.0
    sin_mask[qh:quarter] = True
    sin_mask[quarter + qh : 2 * quarter] = True
    sin_mask[2 * quarter + hh :] = True
    fvec = fflat[None, :] * qmask  # [3, pe_dim]
    return fvec, sin_mask


def pose_embed_pe_xy_yaw(xy: jnp.ndarray, direction: jnp.ndarray, pe_dim: int, theta_xy: float) -> jnp.ndarray:
    """Sinusoidal x/y (pe_dim//4 each) + angular yaw embedding (pe_dim//2).

    Default: the per-quantity stacked embeds. TB_POSE_EMB_FLAT=1 switches to
    the flat [..., pe_dim] formulation — bit-identical but measured slower
    (see :func:`pose_embed_pe_xy_dir`); this is the default rollout rpe
    mode, so it IS the in-scan hot path the A/B measured."""
    from trafficbotsv15_tpu.ops import flags

    yaw = _as_yaw(direction)
    quarter = pe_dim // 4
    if not flags.get().pose_emb_flat:
        return jnp.concatenate(
            [
                sinusoid_embed(xy[..., 0], quarter, theta_xy),
                sinusoid_embed(xy[..., 1], quarter, theta_xy),
                sinusoid_embed_rad(yaw, pe_dim // 2),
            ],
            axis=-1,
        )
    fvec, sin_mask = _pe_xy_yaw_tables(pe_dim, theta_xy)
    x = xy[..., 0:1].astype(jnp.float32)
    y = xy[..., 1:2].astype(jnp.float32)
    w = yaw[..., None].astype(jnp.float32)
    ang = x * fvec[0] + y * fvec[1] + w * fvec[2]  # [..., pe_dim]
    return jnp.where(jnp.asarray(sin_mask), jnp.sin(ang), jnp.cos(ang))


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
