"""CVAE latent encoder (posterior/prior) and distribution heads.

Parity target: /root/reference/src/models/latent_encoder.py. The posterior
sees the full GT episode (temporally downsampled x5); the prior sees only the
history. Both reuse TrafficLightEncoder/AgentEncoder instances with a longer
temporal window in HPTR mode.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from trafficbotsv15_tpu.config import AgEncoderCfg, DistEncoderCfg, LatentEncoderCfg, TlEncoderCfg, TransformerCfg
from trafficbotsv15_tpu.models.agent_encoder import AgentEncoder
from trafficbotsv15_tpu.models.mlp import MLP
from trafficbotsv15_tpu.models.tokens import MapTokens, TlTokens
from trafficbotsv15_tpu.models.traffic_light import TrafficLightEncoder
from trafficbotsv15_tpu.ops.distributions import DiagGaussian, MultiCategorical
from trafficbotsv15_tpu.ops.pose_emb import PoseEmbConfig


class DistEncoder(nn.Module):
    """Latent distribution head (latent_encoder.py:125-253)."""

    cfg: DistEncoderCfg
    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @property
    def skip_forward(self) -> bool:
        return self.cfg.dist_type in ("std_gaus", "std_cat")

    @nn.compact
    def __call__(self, x, valid, ag_type, deterministic: bool = True):
        c = self.cfg
        shape = valid.shape
        if c.dist_type == "std_gaus":
            mean = jnp.zeros(shape + (self.out_dim,), self.dtype)
            std = jnp.ones(shape + (self.out_dim,), self.dtype)
            return DiagGaussian(mean, std, valid=valid)

        if c.dist_type == "std_cat":
            n_class = self.out_dim // c.n_cat
            logits = jnp.zeros(shape + (c.n_cat, n_class), self.dtype)
            return MultiCategorical(logits, valid=valid)

        dims = [self.hidden_dim] * (c.n_layer - 1) + [self.out_dim]
        mk = lambda name: MLP(dims, end_layer_activation=False, use_layernorm=c.mlp_use_layernorm,
                              dtype=self.dtype, name=name)

        def branched(prefix):
            out = 0.0
            for i in range(ag_type.shape[-1]):
                mask = ~(ag_type[..., i] & valid)
                out = out + mk(f"{prefix}{i}")(x, mask, deterministic=deterministic)
            return out

        if c.dist_type == "diag_gaus":
            mean = branched("mean") if c.branch_type else mk("mean")(x, ~valid, deterministic=deterministic)
            if c.log_std is None:
                log_std = branched("log_std") if c.branch_type else mk("log_std")(x, ~valid, deterministic=deterministic)
            else:
                if c.branch_type:
                    log_std = 0.0
                    for i in range(ag_type.shape[-1]):
                        p = self.param(f"log_std{i}", nn.initializers.constant(c.log_std), (self.out_dim,))
                        mask = ~(ag_type[..., i] & valid)
                        log_std = log_std + jnp.where(mask[..., None], 0.0, jnp.broadcast_to(p, shape + (self.out_dim,)))
                else:
                    p = self.param("log_std", nn.initializers.constant(c.log_std), (self.out_dim,))
                    log_std = jnp.broadcast_to(p, shape + (self.out_dim,))
            return DiagGaussian(mean, jnp.exp(log_std), valid=valid)

        if c.dist_type == "cat":
            logits = branched("logits") if c.branch_type else mk("logits")(x, ~valid, deterministic=deterministic)
            n_class = self.out_dim // c.n_cat
            return MultiCategorical(logits.reshape(shape + (c.n_cat, n_class)), valid=valid)
        raise NotImplementedError(c.dist_type)


class LatentEncoder(nn.Module):
    """Posterior/prior encoders + DistEncoder heads."""

    cfg: LatentEncoderCfg
    tl_encoder_cfg: TlEncoderCfg
    ag_encoder_cfg: AgEncoderCfg
    tf_cfg: TransformerCfg
    hidden_dim: int
    tl_state_dim: int
    tl_mode: str
    pairwise_relative: bool
    temp_window_size: int  # the policy's window (>0 HPTR); latent window derives from time_step_gt
    n_tgt_knn: int
    dist_limit: float
    pose_rpe: PoseEmbConfig
    time_step_gt: int
    temp_encoder_n_layer: int = 3
    temp_encoder_pooling: str = "max_valid"
    temp_encoder_dropout_p: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @property
    def dummy(self) -> bool:
        return self.cfg.latent_dim <= 0

    @property
    def out_dim(self) -> int:
        return self.cfg.latent_dim

    def setup(self):
        if self.dummy:
            return
        if self.temp_window_size > 0:
            rate = self.cfg.temporal_down_sample_rate
            window = (self.time_step_gt + 1) // rate + 1 if rate > 1 else self.time_step_gt + 1
        else:
            window = self.temp_window_size

        enc_kw = dict(
            tf_cfg=self.tf_cfg,
            hidden_dim=self.hidden_dim,
            pairwise_relative=self.pairwise_relative,
            temp_window_size=window,
            n_tgt_knn=self.n_tgt_knn,
            dist_limit=self.dist_limit,
            pose_rpe=self.pose_rpe,
            temp_encoder_n_layer=self.temp_encoder_n_layer,
            temp_encoder_pooling=self.temp_encoder_pooling,
            temp_encoder_dropout_p=self.temp_encoder_dropout_p,
            dtype=self.dtype,
        )
        self.tl_encoder_post = TrafficLightEncoder(
            cfg=self.tl_encoder_cfg, tl_state_dim=self.tl_state_dim, tl_mode=self.tl_mode, **enc_kw
        )
        self.ag_encoder_post = AgentEncoder(cfg=self.ag_encoder_cfg, **enc_kw)
        if self.cfg.share_post_prior_encoders:
            self.tl_encoder_prior, self.ag_encoder_prior = self.tl_encoder_post, self.ag_encoder_post
        else:
            self.tl_encoder_prior = TrafficLightEncoder(
                cfg=self.tl_encoder_cfg, tl_state_dim=self.tl_state_dim, tl_mode=self.tl_mode, **enc_kw
            )
            self.ag_encoder_prior = AgentEncoder(cfg=self.ag_encoder_cfg, **enc_kw)

        self.dist_post = DistEncoder(
            cfg=self.cfg.latent_post, hidden_dim=self.hidden_dim, out_dim=self.cfg.latent_dim, dtype=self.dtype
        )
        self.dist_prior = DistEncoder(
            cfg=self.cfg.latent_prior, hidden_dim=self.hidden_dim, out_dim=self.cfg.latent_dim, dtype=self.dtype
        )

    def __call__(
        self,
        ag_valid,  # [n_sc, n_ag, n_step]
        ag_attr,  # [n_sc, n_ag, attr_dim]
        ag_motion,  # [n_sc, n_ag, n_step, 3]
        ag_pose,  # [n_sc, n_ag, n_step, 3]
        ag_type,  # [n_sc, n_ag, 3]
        tl_state,  # [n_sc, n_tl, n_step, state_dim]
        mp_tokens: MapTokens,
        tl_tokens: TlTokens,
        posterior: bool,
        deterministic: bool = True,
    ) -> Optional[object]:
        if self.dummy:
            return None
        dist_head = self.dist_post if posterior else self.dist_prior
        if dist_head.skip_forward:
            return dist_head(ag_attr, jnp.any(ag_valid, axis=-1), ag_type, deterministic=deterministic)

        rate = self.cfg.temporal_down_sample_rate
        if rate > 1:
            ag_valid = ag_valid[:, :, ::rate]
            ag_motion = ag_motion[:, :, ::rate]
            ag_pose = ag_pose[:, :, ::rate]
            tl_state = tl_state[:, :, ::rate]

        tl_enc = self.tl_encoder_post if posterior else self.tl_encoder_prior
        ag_enc = self.ag_encoder_post if posterior else self.ag_encoder_prior

        tl_feature = tl_enc(tl_state, tl_tokens, called_by_latent_encoder=True, deterministic=deterministic)
        ag_feature, _ = ag_enc(
            ag_valid=ag_valid,
            ag_attr=ag_attr,
            ag_motion=ag_motion,
            ag_pose=ag_pose,
            mp_tokens=mp_tokens,
            tl_token_invalid=tl_tokens.invalid,
            tl_token_feature=tl_feature,
            tl_token_pose=tl_tokens.pose,
            called_by_latent_encoder=True,
            deterministic=deterministic,
        )
        return dist_head(ag_feature, jnp.any(ag_valid, axis=-1), ag_type, deterministic=deterministic)
