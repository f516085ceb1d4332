"""Map polyline encoder (VectorNet PointNet + KNN self-attention).

Parity target: /root/reference/src/models/map_encoder.py. Static per scenario:
run once before the rollout scan; its tokens are closed over by every step.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trafficbotsv15_tpu.config import MapEncoderCfg, TransformerCfg
from trafficbotsv15_tpu.models.mlp import InputEncoder, PolylineEncoder
from trafficbotsv15_tpu.models.tokens import MapTokens
from trafficbotsv15_tpu.models.transformer import TransformerBlock
from trafficbotsv15_tpu.ops.pose_emb import PoseEmbConfig, apply_pose_emb, pose_emb_out_dim
from trafficbotsv15_tpu.ops.rpe import get_rel_dist, get_rel_pose, get_tgt_knn, get_tgt_knn_lazy
from trafficbotsv15_tpu.ops.transform import pos2local, rad2local, rad2rot


class MapEncoder(nn.Module):
    cfg: MapEncoderCfg
    tf_cfg: TransformerCfg
    hidden_dim: int
    pairwise_relative: bool
    n_tgt_knn: int
    dist_limit: float
    pose_rpe: PoseEmbConfig  # RPE embedding config (shared across encoders)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mp_valid, mp_attr, mp_pose, mp_type, deterministic: bool = True) -> MapTokens:
        """
        Args (scene-centric):
            mp_valid: [n_sc, n_mp, n_node] bool
            mp_attr: [n_sc, n_mp, mp_attr_dim] (lane-type one-hot)
            mp_pose: [n_sc, n_mp, n_node, 3]
            mp_type: [n_sc, n_mp, n_mp_type] bool one-hot
        """
        n_sc, n_mp, n_node = mp_valid.shape
        mp_token_pose = mp_pose[:, :, 0]
        mp_token_valid = mp_valid[:, :, 0]
        mp_invalid, mp_token_invalid = ~mp_valid, ~mp_token_valid

        # per-node pose embedding, in the polyline's own frame when pairwise-relative
        mp_xy, mp_yaw = mp_pose[..., :2], mp_pose[..., 2]
        if self.pairwise_relative:
            mp_xy = pos2local(mp_xy, mp_token_pose[:, :, None, :2], rad2rot(mp_token_pose[..., 2]))
            mp_yaw = rad2local(mp_yaw, mp_token_pose[..., 2], cast=False)
        pe_cfg = PoseEmbConfig(
            mode=self.cfg.pose_emb.mode,
            pe_dim=self.hidden_dim if self.cfg.input_encoder.mode == "add" else self.hidden_dim // 2,
            theta_xy=self.cfg.pose_emb.theta_xy,
            theta_cs=self.cfg.pose_emb.theta_cs,
        )
        mp_pose_emb = apply_pose_emb(pe_cfg, mp_xy, mp_yaw[..., None])

        # node one-hot id + broadcast polyline attr (map_encoder.py:75-77)
        node_ohe = jnp.broadcast_to(jnp.eye(n_node, dtype=self.dtype)[None, None], (n_sc, n_mp, n_node, n_node))
        attr = jnp.concatenate(
            [jnp.broadcast_to(mp_attr[:, :, None, :], (n_sc, n_mp, n_node, mp_attr.shape[-1])), node_ohe], axis=-1
        )

        feat = InputEncoder(
            hidden_dim=self.hidden_dim,
            pe_dim=pose_emb_out_dim(pe_cfg),
            n_layer=self.cfg.input_encoder.n_layer,
            mode=self.cfg.input_encoder.mode,
            mlp_dropout_p=self.cfg.input_encoder.mlp_dropout_p,
            mlp_use_layernorm=self.cfg.input_encoder.mlp_use_layernorm,
            dtype=self.dtype,
            name="input_encoder",
        )(attr, mp_pose_emb, deterministic=deterministic)

        token_feat = PolylineEncoder(
            hidden_dim=self.hidden_dim,
            n_layer=self.cfg.pl_encoder.n_layer,
            pooling_mode=self.cfg.pl_encoder.pooling_mode,
            mlp_dropout_p=self.cfg.pl_encoder.mlp_dropout_p,
            mlp_use_layernorm=self.cfg.pl_encoder.mlp_use_layernorm,
            dtype=self.dtype,
            name="pl_encoder",
        )(feat, mp_invalid, deterministic=deterministic)

        from trafficbotsv15_tpu.ops import flags

        if self.pairwise_relative and flags.get().mp2mp_lazy:
            # lazy variant: skip materializing the [n_mp, n_mp, 3] rel_pose
            # (SE(2) math on the K winners only) and pick up the fused Pallas
            # KNN at production map sizes. Equivalent to the eager pair up to
            # distance-tie ordering — A/B flag until measured on-chip.
            knn_idx, knn_invalid, rpe = get_tgt_knn_lazy(
                mp_token_pose, mp_token_invalid, mp_token_pose, mp_token_invalid,
                self.n_tgt_knn, self.dist_limit)
        elif self.pairwise_relative:
            rel_pose, rel_dist = get_rel_pose(mp_token_pose, mp_token_invalid)
            knn_idx, knn_invalid, rpe = get_tgt_knn(mp_token_invalid, rel_pose, rel_dist, self.n_tgt_knn, self.dist_limit)
        else:
            rel_dist = get_rel_dist(mp_token_pose[..., :2], mp_token_invalid)
            knn_idx, knn_invalid, rpe = get_tgt_knn(mp_token_invalid, None, rel_dist, self.n_tgt_knn, self.dist_limit)
        if self.pairwise_relative:
            rpe = apply_pose_emb(self.pose_rpe, rpe[..., :2], rpe[..., 2:3])

        token_feat = TransformerBlock(
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
            mode="enc_self_attn",
            d_rpe=pose_emb_out_dim(self.pose_rpe) if self.pairwise_relative else -1,
            dtype=self.dtype,
            name="tf_mp2mp",
        )(
            token_feat,
            src_padding_mask=mp_token_invalid,
            tgt_idx=knn_idx,
            tgt_padding_mask=knn_invalid,
            rpe=rpe,
            deterministic=deterministic,
        )

        return MapTokens(invalid=mp_token_invalid, feature=token_feat, pose=mp_token_pose, type=mp_type)
