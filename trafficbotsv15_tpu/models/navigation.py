"""Navigation encoder and predictor (dest / goal / cmd / dummy).

Parity target: /root/reference/src/models/navigation.py. The dest mode (the
flagship) scores every map polyline per agent with agent/map-type
compatibility masking (navigation.py:246-278).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from trafficbotsv15_tpu.config import AgEncoderCfg, NaviEncoderCfg, NaviPredictorCfg, TransformerCfg
from trafficbotsv15_tpu.models.gru import MultiAgentGRU
from trafficbotsv15_tpu.models.mlp import MLP, InputEncoder
from trafficbotsv15_tpu.models.mlp import PolylineEncoder
from trafficbotsv15_tpu.models.tokens import MapTokens
from trafficbotsv15_tpu.models.transformer import TransformerBlock
from trafficbotsv15_tpu.ops.distributions import DestCategorical, DiagGaussian
from trafficbotsv15_tpu.ops.pooling import seq_pooling
from trafficbotsv15_tpu.ops.pose_emb import PoseEmbConfig, apply_pose_emb, pose_emb_out_dim
from trafficbotsv15_tpu.ops.rpe import gather_tgt, get_rel_dist, get_rel_pose, get_tgt_knn
from trafficbotsv15_tpu.ops.transform import pos2local, pos2global, rad2local, rad2global, rad2rot

_NEG = -1e9


class NaviEncoder(nn.Module):
    """Encode the navigation target into a per-agent feature (navigation.py:18-100)."""

    cfg: NaviEncoderCfg
    hidden_dim: int
    navi_mode: str
    navi_dim: Optional[int]
    pairwise_relative: bool
    mp_pose_emb: PoseEmbConfig  # map encoder's pose emb (goal mode, scene-centric)
    pose_rpe: PoseEmbConfig
    dtype: jnp.dtype = jnp.float32

    @property
    def dummy(self) -> bool:
        return self.navi_mode == "dummy"

    @property
    def require_update(self) -> bool:
        """True when the navi feature depends on the agent pose (recompute per step)."""
        return self.navi_mode in ("dest", "goal") and self.pairwise_relative

    @nn.compact
    def __call__(self, ag_navi, ag_pose, mp_tokens: MapTokens, deterministic: bool = True,
                 mp_rep: int = 1):
        if self.navi_mode == "dummy":
            return None
        if self.navi_mode == "dest":
            # mp_rep > 1: mp_tokens carry the UNIQUE scenarios shared by
            # mp_rep consecutive agent rows (K-futures dedup, sim/rollout.py)
            # — fold the replicas into the agent axis for the per-dest gathers
            mp_feat = mp_tokens.feature
            if self.cfg.dest_detach_mp_feature:
                mp_feat = jax.lax.stop_gradient(mp_feat)
            idx = jnp.clip(ag_navi, 0, mp_feat.shape[1] - 1).astype(jnp.int32)
            n_sc, n_ag = idx.shape
            if mp_rep > 1:
                idx = idx.reshape(n_sc // mp_rep, mp_rep * n_ag)
            feat = jnp.take_along_axis(mp_feat, idx[..., None], axis=1)
            if mp_rep > 1:
                feat = feat.reshape(n_sc, n_ag, feat.shape[-1])
            feat = MLP([self.hidden_dim], end_layer_activation=False, dtype=self.dtype, name="mlp_mp")(feat)
            if self.pairwise_relative:
                dest_pose = jnp.take_along_axis(mp_tokens.pose, idx[..., None], axis=1)
                if mp_rep > 1:
                    dest_pose = dest_pose.reshape(n_sc, n_ag, dest_pose.shape[-1])
                xy = pos2local(
                    dest_pose[:, :, None, :2], ag_pose[:, :, None, :2], rad2rot(ag_pose[..., 2])
                )[:, :, 0]
                yaw = rad2local(dest_pose[..., 2:3], ag_pose[..., 2], cast=False)[..., 0]
                pe = apply_pose_emb(self.pose_rpe, xy, yaw[..., None])
                feat = feat + MLP([self.hidden_dim], end_layer_activation=False, dtype=self.dtype, name="mlp_pe")(pe)
            return feat
        if self.navi_mode == "goal":
            xy, yaw, spd = ag_navi[..., :2], ag_navi[..., 2:3], ag_navi[..., 3:4]
            xy = jax.lax.stop_gradient(xy)
            yaw = jax.lax.stop_gradient(yaw)
            if self.pairwise_relative:
                xy = pos2local(xy[:, :, None], ag_pose[:, :, None, :2], rad2rot(ag_pose[..., 2]))[:, :, 0]
                yaw = rad2local(yaw, ag_pose[..., 2], cast=False)
                pe = apply_pose_emb(self.pose_rpe, xy, yaw)
            else:
                pe = apply_pose_emb(self.mp_pose_emb, xy, yaw)
            return MLP([self.hidden_dim], end_layer_activation=False, dtype=self.dtype, name="mlp")(
                jnp.concatenate([pe, spd], axis=-1)
            )
        if self.navi_mode == "cmd":
            return MLP([self.hidden_dim], end_layer_activation=False, dtype=self.dtype, name="mlp")(
                ag_navi.astype(self.dtype)
            )
        raise NotImplementedError(self.navi_mode)


class NaviPredictor(nn.Module):
    """Predict the navigation target from the agent track (navigation.py:103-322)."""

    cfg: NaviPredictorCfg
    ag_encoder_cfg: AgEncoderCfg
    tf_cfg: TransformerCfg
    hidden_dim: int
    navi_mode: str
    navi_dim: Optional[int]
    pairwise_relative: bool
    temp_window_size: int
    n_tgt_knn: int
    dist_limit: float
    pose_rpe: PoseEmbConfig
    temp_encoder_n_layer: int = 3
    temp_encoder_pooling: str = "max_valid"
    temp_encoder_dropout_p: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        ag_valid,  # [n_sc, n_ag, n_step]
        ag_attr,  # [n_sc, n_ag, attr_dim]
        ag_motion,  # [n_sc, n_ag, n_step, 3]
        ag_pose,  # [n_sc, n_ag, n_step, 3]
        ag_type,  # [n_sc, n_ag, 3]
        mp_tokens: MapTokens,
        deterministic: bool = True,
    ):
        if self.navi_mode == "dummy":
            return None
        if self.cfg.detach_input:
            ag_motion = jax.lax.stop_gradient(ag_motion)
            ag_pose = jax.lax.stop_gradient(ag_pose)
            mp_tokens = mp_tokens.replace(feature=jax.lax.stop_gradient(mp_tokens.feature))

        n_sc, n_ag, n_step = ag_valid.shape
        ag_token_valid = jnp.any(ag_valid, axis=-1)
        ag_invalid, ag_token_invalid = ~ag_valid, ~ag_token_valid
        ag_token_pose = seq_pooling(ag_pose, ag_invalid, "last_valid")

        # track encoder
        if self.temp_window_size > 0:
            if n_step > self.temp_window_size:
                ag_pose = ag_pose[:, :, -self.temp_window_size:]
                ag_motion = ag_motion[:, :, -self.temp_window_size:]
                ag_invalid = ag_invalid[:, :, -self.temp_window_size:]
                n_step = self.temp_window_size
            ag_xy, ag_yaw = ag_pose[..., :2], ag_pose[..., 2]
            if self.pairwise_relative:
                ag_xy = pos2local(ag_xy, ag_token_pose[:, :, None, :2], rad2rot(ag_token_pose[..., 2]))
                ag_yaw = rad2local(ag_yaw, ag_token_pose[..., 2], cast=False)
            pe_dim = self.hidden_dim if self.ag_encoder_cfg.input_encoder.mode == "add" else self.hidden_dim // 2
            pe_cfg = PoseEmbConfig(
                mode=self.ag_encoder_cfg.pose_emb.mode, pe_dim=pe_dim,
                theta_xy=self.ag_encoder_cfg.pose_emb.theta_xy, theta_cs=self.ag_encoder_cfg.pose_emb.theta_cs,
            )
            pe = apply_pose_emb(pe_cfg, ag_xy, ag_yaw[..., None])
            ohe = jnp.eye(self.temp_window_size, dtype=self.dtype)[-n_step:]
            attr = jnp.concatenate(
                [
                    jnp.broadcast_to(ag_attr[:, :, None, :], (n_sc, n_ag, n_step, ag_attr.shape[-1])).astype(self.dtype),
                    ag_motion.astype(self.dtype),
                    jnp.broadcast_to(ohe[None, None], (n_sc, n_ag, n_step, self.temp_window_size)),
                ],
                axis=-1,
            )
            feat = InputEncoder(
                hidden_dim=self.hidden_dim, pe_dim=pose_emb_out_dim(pe_cfg),
                n_layer=self.ag_encoder_cfg.input_encoder.n_layer, mode=self.ag_encoder_cfg.input_encoder.mode,
                mlp_dropout_p=self.ag_encoder_cfg.input_encoder.mlp_dropout_p,
                mlp_use_layernorm=self.ag_encoder_cfg.input_encoder.mlp_use_layernorm,
                dtype=self.dtype, name="input_encoder",
            )(attr, pe, deterministic=deterministic)
            ag_token_feature = PolylineEncoder(
                hidden_dim=self.hidden_dim, n_layer=self.temp_encoder_n_layer,
                pooling_mode=self.temp_encoder_pooling, mlp_dropout_p=self.temp_encoder_dropout_p,
                dtype=self.dtype, name="temp_encoder",
            )(feat, ag_invalid, deterministic=deterministic)
        else:
            pe = None
            if not self.pairwise_relative:
                pe_dim = self.hidden_dim if self.ag_encoder_cfg.input_encoder.mode == "add" else self.hidden_dim // 2
                pe_cfg = PoseEmbConfig(
                    mode=self.ag_encoder_cfg.pose_emb.mode, pe_dim=pe_dim,
                    theta_xy=self.ag_encoder_cfg.pose_emb.theta_xy, theta_cs=self.ag_encoder_cfg.pose_emb.theta_cs,
                )
                pe = apply_pose_emb(pe_cfg, ag_pose[..., :2], ag_pose[..., 2:3])
                in_pe_dim = pose_emb_out_dim(pe_cfg)
            else:
                in_pe_dim = 0
            attr = jnp.concatenate(
                [
                    jnp.broadcast_to(ag_attr[:, :, None, :], (n_sc, n_ag, n_step, ag_attr.shape[-1])).astype(self.dtype),
                    ag_motion.astype(self.dtype),
                ],
                axis=-1,
            )
            feat = InputEncoder(
                hidden_dim=self.hidden_dim, pe_dim=in_pe_dim,
                n_layer=self.ag_encoder_cfg.input_encoder.n_layer, mode=self.ag_encoder_cfg.input_encoder.mode,
                mlp_dropout_p=self.ag_encoder_cfg.input_encoder.mlp_dropout_p,
                mlp_use_layernorm=self.ag_encoder_cfg.input_encoder.mlp_use_layernorm,
                dtype=self.dtype, name="input_encoder",
            )(attr, pe, deterministic=deterministic)
            out, _ = MultiAgentGRU(
                self.hidden_dim, self.temp_encoder_n_layer, self.temp_encoder_dropout_p,
                dtype=self.dtype, name="temp_encoder",
            )(feat, ag_invalid, deterministic=deterministic)
            if self.cfg.rnn_res_add:
                out = out + feat
            ag_token_feature = seq_pooling(out, ag_invalid, self.ag_encoder_cfg.rnn_latent_temp_pool_mode)

        # prediction head
        if self.navi_mode == "dest":
            n_mp = mp_tokens.invalid.shape[1]
            pair = jnp.concatenate(
                [
                    jnp.broadcast_to(ag_token_feature[:, :, None], (n_sc, n_ag, n_mp, self.hidden_dim)),
                    jnp.broadcast_to(mp_tokens.feature[:, None], (n_sc, n_ag, n_mp, self.hidden_dim)),
                ],
                axis=-1,
            )
            if self.pairwise_relative:
                rpe_ag2mp, _ = get_rel_pose(ag_token_pose, ag_token_invalid, mp_tokens.pose, mp_tokens.invalid)
                rpe_ag2mp = apply_pose_emb(self.pose_rpe, rpe_ag2mp[..., :2], rpe_ag2mp[..., 2:3])
                pair = jnp.concatenate([pair, rpe_ag2mp.astype(self.dtype)], axis=-1)
            logits = MLP(
                [self.hidden_dim] * (self.cfg.n_layer_mlp - 1) + [1],
                end_layer_activation=False, use_layernorm=self.cfg.mlp_use_layernorm,
                dtype=self.dtype, name="mlp",
            )(pair, deterministic=deterministic)[..., 0]

            # type compatibility masks (WOMD lane types 0-4; navigation.py:263-273)
            mp_type = mp_tokens.type
            mp_type_mask = mp_tokens.invalid | ~jnp.any(mp_type[:, :, :5], axis=-1)
            m_veh = ag_type[:, :, 0:1] & mp_type[:, :, 3][:, None, :]
            m_ped = ag_type[:, :, 1:2] & jnp.any(mp_type[:, :, :4], axis=-1)[:, None, :]
            m_cyc = ag_type[:, :, 2:3] & jnp.any(mp_type[:, :, :3], axis=-1)[:, None, :]
            logits_invalid = mp_type_mask[:, None, :] | m_veh | m_ped | m_cyc
            logits = jnp.where(logits_invalid, _NEG, logits)
            all_invalid = jnp.all(logits_invalid, axis=-1, keepdims=True)
            logits = jnp.where(ag_token_invalid[..., None] | all_invalid, 0.0, logits)
            return DestCategorical(logits=logits, valid=ag_token_valid)

        # goal / cmd: cross-attend to map KNN then MLP
        n_knn = int(self.n_tgt_knn * self.cfg.k_tgt_knn)
        limit = self.dist_limit * self.cfg.k_dist_limit
        if self.pairwise_relative:
            rel_pose, rel_dist = get_rel_pose(ag_token_pose, ag_token_invalid, mp_tokens.pose, mp_tokens.invalid)
        else:
            rel_pose = None
            rel_dist = get_rel_dist(ag_token_pose[..., :2], ag_token_invalid, mp_tokens.pose[..., :2], mp_tokens.invalid)
        idx, knn_invalid, rpe = get_tgt_knn(mp_tokens.invalid, rel_pose, rel_dist, n_knn, limit)
        knn_tgt = gather_tgt(mp_tokens.feature, idx)
        if self.pairwise_relative:
            rpe = apply_pose_emb(self.pose_rpe, rpe[..., :2], rpe[..., 2:3])

        ag_token_feature = TransformerBlock(
            d_model=self.tf_cfg.d_model, n_head=self.tf_cfg.n_head, k_feedforward=self.tf_cfg.k_feedforward,
            dropout_p=self.tf_cfg.dropout_p, bias=self.tf_cfg.bias, activation=self.tf_cfg.activation,
            out_layernorm=self.tf_cfg.out_layernorm, apply_q_rpe=self.tf_cfg.apply_q_rpe,
            use_pallas=self.tf_cfg.use_pallas,
            attn_dropout_weights=self.tf_cfg.attn_dropout_weights,
            seg_attn=self.tf_cfg.seg_attn,
            dense_knn_max=self.tf_cfg.dense_knn_max,
            n_layer=self.cfg.n_layer_tf, mode="enc_cross_attn",
            d_rpe=pose_emb_out_dim(self.pose_rpe) if self.pairwise_relative else -1,
            dtype=self.dtype, name="tf_ag2mp",
        )(
            ag_token_feature, src_padding_mask=ag_token_invalid, tgt=knn_tgt,
            tgt_padding_mask=knn_invalid, rpe=rpe, deterministic=deterministic,
        )
        out = MLP(
            [self.hidden_dim] * (self.cfg.n_layer_mlp - 1) + [self.navi_dim],
            end_layer_activation=False, use_layernorm=self.cfg.mlp_use_layernorm,
            dtype=self.dtype, name="mlp",
        )(ag_token_feature, deterministic=deterministic)

        if self.navi_mode == "goal":
            if self.pairwise_relative:
                ref_pos, ref_yaw = ag_token_pose[:, :, None, :2], ag_token_pose[..., 2]
                ref_rot = rad2rot(ref_yaw)
                xy = pos2global(out[:, :, None, :2], ref_pos, ref_rot)[:, :, 0]
                yaw = rad2global(out[:, :, 2:3], ref_yaw)
                out = jnp.concatenate([xy, yaw, out[:, :, 3:4]], axis=-1)
            out = jnp.where(ag_token_invalid[..., None], 0.0, out)
            log_std = self.param("log_std", nn.initializers.constant(self.cfg.goal_log_std), (self.navi_dim,))
            return DiagGaussian(out, jnp.broadcast_to(jnp.exp(log_std), out.shape), valid=ag_token_valid)
        if self.navi_mode == "cmd":
            out = jnp.where(ag_token_invalid[..., None], 0.0, out)
            return DestCategorical(logits=out, valid=ag_token_valid)
        raise NotImplementedError(self.navi_mode)
