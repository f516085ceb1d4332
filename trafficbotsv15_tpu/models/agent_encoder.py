"""Agent encoder: HPTR temporal-token path and TrafficBots RNN paths.

Parity target: /root/reference/src/models/agent_encoder.py. Three forwards:
  - hptr:        temporal tokens over the history window, PointNet aggregation,
                 dec-cross-attn to [map ⊕ tl] KNN with ag2ag decoder self-attn
                 (agent_encoder.py:114-178). Used per rollout step AND by the
                 latent encoder (with a longer window).
  - rnn_rollout: last-step token, ag2mp + ag2tl cross attn, ag2ag self attn,
                 GRU carry (agent_encoder.py:180-249).
  - rnn_latent:  full flattened (scene*step) sequence for the CVAE posterior
                 (agent_encoder.py:251-319).

All shapes static; the per-step KNN recompute (topk over 1024 map tokens per
agent) is the rollout's hot op and is deliberately kept as pure jnp so XLA can
fuse the gather chain; the attention itself can run the Pallas KNARPE kernel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from trafficbotsv15_tpu.config import AgEncoderCfg, TransformerCfg
from trafficbotsv15_tpu.models.gru import MultiAgentGRU
from trafficbotsv15_tpu.models.mlp import InputEncoder, PolylineEncoder
from trafficbotsv15_tpu.models.tokens import MapTokens
from trafficbotsv15_tpu.models.transformer import TransformerBlock
from trafficbotsv15_tpu.ops.pooling import seq_pooling
from trafficbotsv15_tpu.ops.pose_emb import PoseEmbConfig, apply_pose_emb, pose_emb_out_dim
from trafficbotsv15_tpu.ops.rpe import gather_tgt, get_rel_dist, get_rel_pose, get_tgt_knn, get_tgt_knn_lazy
from trafficbotsv15_tpu.ops.transform import pos2local, rad2local, rad2rot


class AgentEncoder(nn.Module):
    cfg: AgEncoderCfg
    tf_cfg: TransformerCfg
    hidden_dim: int
    pairwise_relative: bool
    temp_window_size: int  # > 0: HPTR; <= 0: RNN
    n_tgt_knn: int
    dist_limit: float
    pose_rpe: PoseEmbConfig
    temp_encoder_n_layer: int = 3
    temp_encoder_pooling: str = "max_valid"
    temp_encoder_dropout_p: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.temp_window_size <= 0 and self.pairwise_relative:
            self._pe_cfg, self._pe_dim = None, 0  # relative RNN: no absolute pose input
        else:
            pe_dim = self.hidden_dim if self.cfg.input_encoder.mode == "add" else self.hidden_dim // 2
            self._pe_cfg = PoseEmbConfig(
                mode=self.cfg.pose_emb.mode, pe_dim=pe_dim,
                theta_xy=self.cfg.pose_emb.theta_xy, theta_cs=self.cfg.pose_emb.theta_cs,
            )
            self._pe_dim = pose_emb_out_dim(self._pe_cfg)

        self.input_encoder = InputEncoder(
            hidden_dim=self.hidden_dim,
            pe_dim=self._pe_dim,
            n_layer=self.cfg.input_encoder.n_layer,
            mode=self.cfg.input_encoder.mode,
            mlp_dropout_p=self.cfg.input_encoder.mlp_dropout_p,
            mlp_use_layernorm=self.cfg.input_encoder.mlp_use_layernorm,
            dtype=self.dtype,
        )

        d_rpe = pose_emb_out_dim(self.pose_rpe) if self.pairwise_relative else -1
        tf_kw = dict(
            d_model=self.tf_cfg.d_model,
            n_head=self.tf_cfg.n_head,
            k_feedforward=self.tf_cfg.k_feedforward,
            dropout_p=self.tf_cfg.dropout_p,
            bias=self.tf_cfg.bias,
            activation=self.tf_cfg.activation,
            out_layernorm=self.tf_cfg.out_layernorm,
            apply_q_rpe=self.tf_cfg.apply_q_rpe,
            use_pallas=self.tf_cfg.use_pallas,
            attn_dropout_weights=self.tf_cfg.attn_dropout_weights,
            seg_attn=self.tf_cfg.seg_attn,
            dense_knn_max=self.tf_cfg.dense_knn_max,
            n_layer=self.cfg.n_layer_tf,
            d_rpe=d_rpe,
            dtype=self.dtype,
        )
        if self.temp_window_size > 0:
            self.temp_encoder = PolylineEncoder(
                hidden_dim=self.hidden_dim,
                n_layer=self.temp_encoder_n_layer,
                pooling_mode=self.temp_encoder_pooling,
                mlp_dropout_p=self.temp_encoder_dropout_p,
                dtype=self.dtype,
            )
            self.tf_ag2agmptl = TransformerBlock(mode="dec_cross_attn", **tf_kw)
        else:
            self.tf_ag2mp = TransformerBlock(mode="enc_cross_attn", **tf_kw)
            self.tf_ag2tl = TransformerBlock(mode="enc_cross_attn", **tf_kw)
            self.tf_ag2ag = TransformerBlock(mode="enc_self_attn", **tf_kw)
            self.temp_encoder = MultiAgentGRU(
                self.hidden_dim, self.temp_encoder_n_layer, self.temp_encoder_dropout_p, dtype=self.dtype
            )

    @property
    def n_knn_ag2ag(self) -> int:
        return int(self.n_tgt_knn * self.cfg.k_tgt_knn_ag2ag)

    @property
    def n_knn_ag2mp(self) -> int:
        return int(self.n_tgt_knn * self.cfg.k_tgt_knn_ag2mp)

    @property
    def n_knn_ag2tl(self) -> int:
        return int(self.n_tgt_knn * self.cfg.k_tgt_knn_ag2tl)

    def _knn(self, src_invalid, src_pose, tgt_invalid, tgt_pose, tgt_feature, n_knn,
             gather_feature=True, tgt_rep=1):
        """KNN of one relation. Returns dict(tgt/idx, invalid, rpe).

        tgt_rep > 1: the targets are static tokens shared by tgt_rep
        consecutive source rows (K-futures map/TL dedup, PERF.md chain12) —
        tgt_* then carry the unique scenarios [n_sc // tgt_rep, ...]; the
        selection is bit-identical and the feature/pose gathers read the
        unique tensors."""
        limit = self.dist_limit * self.cfg.k_dist_limit
        if self.pairwise_relative:
            # lazy variant: SE(2) localization only for the K winners
            idx, invalid, rpe = get_tgt_knn_lazy(
                src_pose, src_invalid, tgt_pose, tgt_invalid, n_knn, limit, tgt_rep=tgt_rep)
        else:
            if tgt_rep > 1:
                n_u = tgt_pose.shape[0]
                brd = lambda x: jnp.broadcast_to(
                    x[:, None], (n_u, tgt_rep) + x.shape[1:]
                ).reshape((n_u * tgt_rep,) + x.shape[1:])
                tgt_invalid_f, tgt_pose_f = brd(tgt_invalid), brd(tgt_pose)
            else:
                tgt_invalid_f, tgt_pose_f = tgt_invalid, tgt_pose
            rel_dist = get_rel_dist(src_pose[..., :2], src_invalid, tgt_pose_f[..., :2], tgt_invalid_f)
            idx, invalid, rpe = get_tgt_knn(tgt_invalid_f, None, rel_dist, n_knn, limit)
        out = {"idx": idx, "invalid": invalid, "rpe": None}
        if self.pairwise_relative:
            out["rpe"] = apply_pose_emb(self.pose_rpe, rpe[..., :2], rpe[..., 2:3])
        if gather_feature:
            out["tgt"] = gather_tgt(tgt_feature, idx, tgt_rep=tgt_rep)
        return out

    def _knn_self(self, invalid, pose, n_knn):
        limit = self.dist_limit * self.cfg.k_dist_limit
        if self.pairwise_relative:
            idx, knn_invalid, rpe = get_tgt_knn_lazy(pose, invalid, pose, invalid, n_knn, limit)
        else:
            rel_dist = get_rel_dist(pose[..., :2], invalid)
            idx, knn_invalid, rpe = get_tgt_knn(invalid, None, rel_dist, n_knn, limit)
        out = {"idx": idx, "invalid": knn_invalid, "rpe": None}
        if self.pairwise_relative:
            out["rpe"] = apply_pose_emb(self.pose_rpe, rpe[..., :2], rpe[..., 2:3])
        return out

    def hptr_temporal_tokens(self, ag_valid, ag_attr, ag_motion, ag_pose, ag_token_pose, deterministic):
        """Temporal input tokens + PointNet aggregation (agent_encoder.py:144-162).

        ag_valid: [n_sc, n_ag, n_step]; returns [n_sc, n_ag, hidden].
        """
        n_sc, n_ag, n_step = ag_valid.shape
        ag_invalid = ~ag_valid
        ag_xy, ag_yaw = ag_pose[..., :2], ag_pose[..., 2]
        if self.pairwise_relative:
            ag_xy = pos2local(ag_xy, ag_token_pose[:, :, None, :2], rad2rot(ag_token_pose[..., 2]))
            ag_yaw = rad2local(ag_yaw, ag_token_pose[..., 2], cast=False)
        pe = apply_pose_emb(self._pe_cfg, ag_xy, ag_yaw[..., None])

        ohe = jnp.eye(self.temp_window_size, dtype=self.dtype)[-n_step:]
        attr = jnp.concatenate(
            [
                jnp.broadcast_to(ag_attr[:, :, None, :], (n_sc, n_ag, n_step, ag_attr.shape[-1])).astype(self.dtype),
                ag_motion.astype(self.dtype),
                jnp.broadcast_to(ohe[None, None], (n_sc, n_ag, n_step, self.temp_window_size)),
            ],
            axis=-1,
        )
        feat = self.input_encoder(attr, pe, deterministic=deterministic)
        return self.temp_encoder(feat, ag_invalid, deterministic=deterministic)

    def __call__(
        self,
        ag_valid,  # [n_sc, n_ag, n_step] bool
        ag_attr,  # [n_sc, n_ag, attr_dim]
        ag_motion,  # [n_sc, n_ag, n_step, 3]
        ag_pose,  # [n_sc, n_ag, n_step, 3]
        mp_tokens: MapTokens,
        tl_token_invalid,  # [n_sc, n_tl]
        tl_token_feature,  # [n_sc, n_tl, (n_step,) hidden]
        tl_token_pose,  # [n_sc, n_tl, 3]
        rnn_hidden: Optional[jnp.ndarray] = None,
        called_by_latent_encoder: bool = False,
        deterministic: bool = True,
        token_rep: int = 1,  # map/TL tokens carry unique scenarios, shared by
        # token_rep consecutive agent rows (K-futures dedup; HPTR path only)
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        if self.temp_window_size > 0:
            out = self._forward_hptr(
                ag_valid, ag_attr, ag_motion, ag_pose, mp_tokens,
                tl_token_invalid, tl_token_feature, tl_token_pose, deterministic,
                token_rep=token_rep,
            )
            return out, None
        assert token_rep == 1, "token dedup is only wired for the HPTR path"
        if called_by_latent_encoder:
            out = self._forward_rnn_latent(
                ag_valid, ag_attr, ag_motion, ag_pose, mp_tokens,
                tl_token_invalid, tl_token_feature, tl_token_pose, deterministic,
            )
            return out, None
        return self._forward_rnn_rollout(
            ag_valid, ag_attr, ag_motion, ag_pose, mp_tokens,
            tl_token_invalid, tl_token_feature, tl_token_pose, rnn_hidden, deterministic,
        )

    # ------------------------------------------------------------------ HPTR
    def _forward_hptr(
        self, ag_valid, ag_attr, ag_motion, ag_pose, mp_tokens,
        tl_token_invalid, tl_token_feature, tl_token_pose, deterministic,
        token_rep=1,
    ):
        ag_invalid = ~ag_valid
        ag_token_invalid = ~jnp.any(ag_valid, axis=-1)
        ag_token_pose = seq_pooling(ag_pose, ag_invalid, "last_valid")

        knn_ag2mp = self._knn(
            ag_token_invalid, ag_token_pose, mp_tokens.invalid, mp_tokens.pose, mp_tokens.feature, self.n_knn_ag2mp,
            tgt_rep=token_rep,
        )
        knn_ag2tl = self._knn(
            ag_token_invalid, ag_token_pose, tl_token_invalid, tl_token_pose, tl_token_feature, self.n_knn_ag2tl,
            tgt_rep=token_rep,
        )
        knn_ag2ag = self._knn_self(ag_token_invalid, ag_token_pose, self.n_knn_ag2ag)

        ag_token_feature = self.hptr_temporal_tokens(
            ag_valid, ag_attr, ag_motion, ag_pose, ag_token_pose, deterministic
        )

        tgt = jnp.concatenate([knn_ag2mp["tgt"], knn_ag2tl["tgt"]], axis=2)
        tgt_invalid = jnp.concatenate([knn_ag2mp["invalid"], knn_ag2tl["invalid"]], axis=2)
        rpe = None
        if self.pairwise_relative:
            rpe = jnp.concatenate([knn_ag2mp["rpe"], knn_ag2tl["rpe"]], axis=2)
        ag_token_feature = self.tf_ag2agmptl(
            ag_token_feature,
            src_padding_mask=ag_token_invalid,
            tgt=tgt,
            tgt_padding_mask=tgt_invalid,
            rpe=rpe,
            decoder_tgt_idx=knn_ag2ag["idx"],
            decoder_tgt_padding_mask=knn_ag2ag["invalid"],
            decoder_rpe=knn_ag2ag["rpe"],
            deterministic=deterministic,
        )
        return ag_token_feature

    # ------------------------------------------------------- TrafficBots RNN
    def _forward_rnn_rollout(
        self, ag_valid, ag_attr, ag_motion, ag_pose, mp_tokens,
        tl_token_invalid, tl_token_feature, tl_token_pose, rnn_hidden, deterministic,
    ):
        ag_token_pose = ag_pose[:, :, -1]
        ag_token_invalid = ~ag_valid[:, :, -1]

        knn_ag2mp = self._knn(
            ag_token_invalid, ag_token_pose, mp_tokens.invalid, mp_tokens.pose, mp_tokens.feature, self.n_knn_ag2mp
        )
        knn_ag2tl = self._knn(
            ag_token_invalid, ag_token_pose, tl_token_invalid, tl_token_pose, tl_token_feature, self.n_knn_ag2tl
        )
        knn_ag2ag = self._knn_self(ag_token_invalid, ag_token_pose, self.n_knn_ag2ag)

        pe = None
        if not self.pairwise_relative:
            pe = apply_pose_emb(self._pe_cfg, ag_token_pose[..., :2], ag_token_pose[..., 2:3])
        attr = jnp.concatenate([ag_attr.astype(self.dtype), ag_motion[:, :, -1].astype(self.dtype)], axis=-1)
        feat = self.input_encoder(attr, pe, deterministic=deterministic)

        feat = self.tf_ag2mp(
            feat, src_padding_mask=ag_token_invalid, tgt=knn_ag2mp["tgt"],
            tgt_padding_mask=knn_ag2mp["invalid"], rpe=knn_ag2mp["rpe"], deterministic=deterministic,
        )
        feat = self.tf_ag2tl(
            feat, src_padding_mask=ag_token_invalid, tgt=knn_ag2tl["tgt"],
            tgt_padding_mask=knn_ag2tl["invalid"], rpe=knn_ag2tl["rpe"], deterministic=deterministic,
        )
        feat = self.tf_ag2ag(
            feat, src_padding_mask=ag_token_invalid, tgt_idx=knn_ag2ag["idx"],
            tgt_padding_mask=knn_ag2ag["invalid"], rpe=knn_ag2ag["rpe"], deterministic=deterministic,
        )
        feat, rnn_hidden = self.temp_encoder(feat, ag_token_invalid, rnn_hidden, deterministic=deterministic)
        return feat, rnn_hidden

    def _forward_rnn_latent(
        self, ag_valid, ag_attr, ag_motion, ag_pose, mp_tokens,
        tl_token_invalid, tl_token_feature, tl_token_pose, deterministic,
    ):
        """Full-sequence encoding for the CVAE (agent_encoder.py:251-319).
        tl_token_feature here is [n_sc, n_tl, n_step, hidden]."""
        n_sc, n_ag, n_step = ag_valid.shape
        ag_invalid = ~ag_valid
        h = self.hidden_dim

        pe = None
        if not self.pairwise_relative:
            pe = apply_pose_emb(self._pe_cfg, ag_pose[..., :2], ag_pose[..., 2:3])
        attr = jnp.concatenate(
            [
                jnp.broadcast_to(ag_attr[:, :, None, :], (n_sc, n_ag, n_step, ag_attr.shape[-1])).astype(self.dtype),
                ag_motion.astype(self.dtype),
            ],
            axis=-1,
        )
        feat = self.input_encoder(attr, pe, deterministic=deterministic)  # [n_sc, n_ag, n_step, h]

        # ag2mp over [n_sc, n_ag*n_step] sources
        flat_invalid = ag_invalid.reshape(n_sc, n_ag * n_step)
        flat_pose = ag_pose.reshape(n_sc, n_ag * n_step, 3)
        knn_ag2mp = self._knn(
            flat_invalid, flat_pose, mp_tokens.invalid, mp_tokens.pose, mp_tokens.feature, self.n_knn_ag2mp
        )
        feat = self.tf_ag2mp(
            feat.reshape(n_sc, n_ag * n_step, h),
            src_padding_mask=flat_invalid,
            tgt=knn_ag2mp["tgt"], tgt_padding_mask=knn_ag2mp["invalid"], rpe=knn_ag2mp["rpe"],
            deterministic=deterministic,
        ).reshape(n_sc, n_ag, n_step, h)

        # ag2tl and ag2ag over [n_sc*n_step, n_ag] sources
        step_pose = jnp.moveaxis(ag_pose, 2, 1).reshape(n_sc * n_step, n_ag, 3)
        step_invalid = jnp.moveaxis(ag_invalid, 2, 1).reshape(n_sc * n_step, n_ag)
        tl_feat_step = jnp.moveaxis(tl_token_feature, 2, 1).reshape(n_sc * n_step, -1, h)
        n_tl = tl_token_invalid.shape[1]
        tl_pose_step = jnp.broadcast_to(tl_token_pose[:, None], (n_sc, n_step, n_tl, 3)).reshape(n_sc * n_step, n_tl, 3)
        tl_invalid_step = jnp.broadcast_to(tl_token_invalid[:, None], (n_sc, n_step, n_tl)).reshape(n_sc * n_step, n_tl)

        knn_ag2tl = self._knn(step_invalid, step_pose, tl_invalid_step, tl_pose_step, tl_feat_step, self.n_knn_ag2tl)
        feat = jnp.moveaxis(feat, 2, 1).reshape(n_sc * n_step, n_ag, h)
        feat = self.tf_ag2tl(
            feat, src_padding_mask=step_invalid, tgt=knn_ag2tl["tgt"],
            tgt_padding_mask=knn_ag2tl["invalid"], rpe=knn_ag2tl["rpe"], deterministic=deterministic,
        )
        knn_ag2ag = self._knn_self(step_invalid, step_pose, self.n_knn_ag2ag)
        feat = self.tf_ag2ag(
            feat, src_padding_mask=step_invalid, tgt_idx=knn_ag2ag["idx"],
            tgt_padding_mask=knn_ag2ag["invalid"], rpe=knn_ag2ag["rpe"], deterministic=deterministic,
        )
        feat = jnp.moveaxis(feat.reshape(n_sc, n_step, n_ag, h), 1, 2)

        feat, _ = self.temp_encoder(feat, ag_invalid, deterministic=deterministic)
        return seq_pooling(feat, ag_invalid, self.cfg.rnn_latent_temp_pool_mode)
