"""Token containers passed between encoders (pytree dataclasses)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MapTokens:
    """Static per-scenario map polyline tokens (map_encoder.py:107-112)."""

    invalid: jnp.ndarray  # [n_sc, n_mp] bool
    feature: jnp.ndarray  # [n_sc, n_mp, hidden_dim]
    pose: jnp.ndarray  # [n_sc, n_mp, 3]
    type: jnp.ndarray  # [n_sc, n_mp, n_mp_type] bool one-hot


@struct.dataclass
class TlTokens:
    """Static traffic-light tokens + precomputed KNN/RPE (traffic_light.py:86-111)."""

    valid: jnp.ndarray  # [n_sc, n_tl] bool
    invalid: jnp.ndarray  # [n_sc, n_tl] bool
    pose: jnp.ndarray  # [n_sc, n_tl, 3]
    attr: Optional[jnp.ndarray] = None  # [n_sc, n_tl, hidden_dim] (tl_lane mode)
    knn_idx_tl2tl: Optional[jnp.ndarray] = None  # [n_sc, n_tl, K_tl2tl]
    knn_invalid_tl2tl: Optional[jnp.ndarray] = None
    rpe_tl2tl: Optional[jnp.ndarray] = None  # [n_sc, n_tl, K_tl2tl, d_rpe] (projected)
    knn_tgt_tl2mp: Optional[jnp.ndarray] = None  # [n_sc, n_tl, K_tl2mp, hidden_dim]
    knn_invalid_tl2mp: Optional[jnp.ndarray] = None
    rpe_tl2mp: Optional[jnp.ndarray] = None
    # per-layer scenario-static projections for tf_tl2tlmp, hoisted out of the
    # rollout scan: [(cross k+rpe_k / v+rpe_v, decoder self-attn rpe_k/v)]
    static_kv: Optional[tuple] = None
