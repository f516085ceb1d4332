"""Traffic light encoder and next-state predictor.

Parity target: /root/reference/src/models/traffic_light.py.

HPTR mode (temp_window_size > 0, the flagship): static tokens + KNN indices +
RPE embeddings are precomputed once per scenario (`precompute`); the per-step
`__call__` encodes the rolling tl-state window with a temporal PointNet and a
dec-cross-attn block to the map.

TPU note: the reference appends to a growing python list of states; here the
window is a fixed [n_sc, n_tl, W, state_dim] buffer with a step-valid mask so
the whole rollout compiles to one lax.scan. Unfilled leading slots are invalid
and zero, matching the reference's left-zero-padding / shorter-history math.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from trafficbotsv15_tpu.config import TlEncoderCfg, TlStatePredictorCfg, TransformerCfg
from trafficbotsv15_tpu.models.gru import MultiAgentGRU
from trafficbotsv15_tpu.models.mlp import MLP, InputEncoder, PolylineEncoder
from trafficbotsv15_tpu.models.tokens import MapTokens, TlTokens
from trafficbotsv15_tpu.models.transformer import TransformerBlock
from trafficbotsv15_tpu.ops.pose_emb import PoseEmbConfig, apply_pose_emb, pose_emb_out_dim
from trafficbotsv15_tpu.ops.rpe import gather_tgt, get_rel_dist, get_rel_pose, get_tgt_knn


class TrafficLightEncoder(nn.Module):
    cfg: TlEncoderCfg
    tf_cfg: TransformerCfg
    hidden_dim: int
    tl_state_dim: int
    tl_mode: str  # "lane" | "stop"
    pairwise_relative: bool
    temp_window_size: int  # > 0: HPTR; <= 0: TrafficBots RNN (last step only)
    n_tgt_knn: int
    dist_limit: float
    pose_rpe: PoseEmbConfig
    temp_encoder_n_layer: int = 3
    temp_encoder_pooling: str = "max_valid"
    temp_encoder_dropout_p: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.tl_mode == "stop":
            if self.pairwise_relative:
                self._pe_cfg, self._pe_dim = None, 0
            else:
                pe_dim = self.hidden_dim if self.cfg.input_encoder.mode == "add" else self.hidden_dim // 2
                self._pe_cfg = PoseEmbConfig(
                    mode=self.cfg.pose_emb.mode, pe_dim=pe_dim,
                    theta_xy=self.cfg.pose_emb.theta_xy, theta_cs=self.cfg.pose_emb.theta_cs,
                )
                self._pe_dim = pose_emb_out_dim(self._pe_cfg)
        elif self.tl_mode == "lane":
            self._pe_cfg, self._pe_dim = None, self.hidden_dim  # pe := map lane feature
        else:
            raise NotImplementedError(self.tl_mode)

        if self.temp_window_size > 0:
            if self.cfg.temp_stack_input:
                attr_dim = self.tl_state_dim * self.temp_window_size
            else:
                attr_dim = self.tl_state_dim + self.temp_window_size
                self.temp_encoder = PolylineEncoder(
                    hidden_dim=self.hidden_dim,
                    n_layer=self.temp_encoder_n_layer,
                    pooling_mode=self.temp_encoder_pooling,
                    mlp_dropout_p=self.temp_encoder_dropout_p,
                    dtype=self.dtype,
                )
            self.tf_tl2tlmp = TransformerBlock(
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
                mode="dec_cross_attn",
                d_rpe=pose_emb_out_dim(self.pose_rpe) if self.pairwise_relative else -1,
                dtype=self.dtype,
            )
        else:
            attr_dim = self.tl_state_dim
        del attr_dim  # input dim is inferred by flax Dense

        self.input_encoder = InputEncoder(
            hidden_dim=self.hidden_dim,
            pe_dim=self._pe_dim,
            n_layer=self.cfg.input_encoder.n_layer,
            mode=self.cfg.input_encoder.mode,
            mlp_dropout_p=self.cfg.input_encoder.mlp_dropout_p,
            mlp_use_layernorm=self.cfg.input_encoder.mlp_use_layernorm,
            dtype=self.dtype,
        )

    @property
    def n_knn_tl2tl(self) -> int:
        return int(self.n_tgt_knn * self.cfg.k_tgt_knn_tl2tl)

    @property
    def n_knn_tl2mp(self) -> int:
        return int(self.n_tgt_knn * self.cfg.k_tgt_knn_tl2mp)

    def precompute(self, tl_valid, tl_attr, tl_pose, mp_tokens: MapTokens) -> TlTokens:
        """Static tokens + KNN/RPE (traffic_light.py:76-154). Runs once per scenario.

        tl_attr: int lane index [n_sc, n_tl] in lane mode, else ignored.
        """
        n_sc, n_tl = tl_valid.shape
        tl_token_invalid = ~tl_valid
        attr = None
        if self.tl_mode == "lane":
            mp_feat = mp_tokens.feature
            if self.cfg.tl_lane_detach_mp_feature:
                mp_feat = jax.lax.stop_gradient(mp_feat)
            idx = jnp.clip(tl_attr, 0, mp_feat.shape[1] - 1).astype(jnp.int32)
            attr = jnp.take_along_axis(mp_feat, idx[..., None], axis=1)

        kwargs = dict(
            valid=tl_valid, invalid=tl_token_invalid, pose=tl_pose, attr=attr,
        )
        if self.temp_window_size > 0:
            dist_limit = self.dist_limit * self.cfg.k_dist_limit
            if self.pairwise_relative:
                rel_pose_tl2tl, rel_dist_tl2tl = get_rel_pose(tl_pose, tl_token_invalid)
                rel_pose_tl2mp, rel_dist_tl2mp = get_rel_pose(
                    tl_pose, tl_token_invalid, mp_tokens.pose, mp_tokens.invalid
                )
            else:
                rel_pose_tl2tl, rel_dist_tl2tl = None, get_rel_dist(tl_pose[..., :2], tl_token_invalid)
                rel_pose_tl2mp = None
                rel_dist_tl2mp = get_rel_dist(
                    tl_pose[..., :2], tl_token_invalid, mp_tokens.pose[..., :2], mp_tokens.invalid
                )
            idx_tl2tl, inv_tl2tl, rpe_tl2tl = get_tgt_knn(
                tl_token_invalid, rel_pose_tl2tl, rel_dist_tl2tl, self.n_knn_tl2tl, dist_limit
            )
            idx_tl2mp, inv_tl2mp, rpe_tl2mp = get_tgt_knn(
                mp_tokens.invalid, rel_pose_tl2mp, rel_dist_tl2mp, self.n_knn_tl2mp, dist_limit
            )
            kwargs.update(
                knn_idx_tl2tl=idx_tl2tl,
                knn_invalid_tl2tl=inv_tl2tl,
                knn_tgt_tl2mp=gather_tgt(mp_tokens.feature, idx_tl2mp),
                knn_invalid_tl2mp=inv_tl2mp,
            )
            if self.pairwise_relative:
                kwargs["rpe_tl2tl"] = apply_pose_emb(self.pose_rpe, rpe_tl2tl[..., :2], rpe_tl2tl[..., 2:3])
                kwargs["rpe_tl2mp"] = apply_pose_emb(self.pose_rpe, rpe_tl2mp[..., :2], rpe_tl2mp[..., 2:3])
            # hoist the scenario-static attention projections out of the scan:
            # cross-attn K/V(+rpe) of the static map targets and the decoder
            # self-attn rpe_k/v are identical at every rollout step
            kwargs["static_kv"] = tuple(self.tf_tl2tlmp(
                None,
                tgt=kwargs["knn_tgt_tl2mp"],
                rpe=kwargs.get("rpe_tl2mp"),
                decoder_rpe=kwargs.get("rpe_tl2tl"),
                compute_static_kv=True,
            ))
        return TlTokens(**kwargs)

    def _tl_feature(self, tl_state, attr, pose, deterministic):
        """Fuse tl_state with lane feature / stop pose (traffic_light.py:156-182).
        tl_state: [n_sc, n_tl, (n_step), attr_dim]."""
        tl_state = tl_state.astype(self.dtype)
        if self.tl_mode == "stop":
            if self.pairwise_relative:
                return self.input_encoder(tl_state, None, deterministic=deterministic)
            pe = apply_pose_emb(self._pe_cfg, pose[..., :2], pose[..., 2:3])
            if tl_state.ndim == 4:
                pe = jnp.broadcast_to(pe[:, :, None], tl_state.shape[:3] + (pe.shape[-1],))
            return self.input_encoder(tl_state, pe, deterministic=deterministic)
        # lane mode: pe := map lane feature
        if tl_state.ndim == 4:
            attr = jnp.broadcast_to(attr[:, :, None], tl_state.shape[:3] + (attr.shape[-1],))
        return self.input_encoder(tl_state, attr, deterministic=deterministic)

    def __call__(
        self,
        tl_state: jnp.ndarray,  # [n_sc, n_tl, n_step, state_dim] (n_step <= temp_window_size)
        tl_tokens: TlTokens,
        step_invalid: Optional[jnp.ndarray] = None,  # [n_step] bool: unfilled window slots
        called_by_latent_encoder: bool = False,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Returns tl_token_feature [n_sc, n_tl, hidden] (HPTR) or
        [n_sc, n_tl, n_step, hidden] (RNN latent-encoder path)."""
        n_sc, n_tl, n_step, _ = tl_state.shape
        invalid = tl_tokens.invalid

        if self.temp_window_size > 0:
            assert n_step <= self.temp_window_size
            if self.cfg.temp_stack_input:
                pad = self.temp_window_size - n_step
                if pad:
                    tl_state = jnp.pad(tl_state, ((0, 0), (0, 0), (pad, 0), (0, 0)))
                flat = tl_state.reshape(n_sc, n_tl, self.temp_window_size * self.tl_state_dim)
                feat = self._tl_feature(flat, tl_tokens.attr, tl_tokens.pose, deterministic)
            else:
                ohe = jnp.eye(self.temp_window_size, dtype=self.dtype)[-n_step:]
                ohe = jnp.broadcast_to(ohe[None, None], (n_sc, n_tl, n_step, self.temp_window_size))
                state_in = jnp.concatenate([tl_state.astype(self.dtype), ohe], axis=-1)
                feat = self._tl_feature(state_in, tl_tokens.attr, tl_tokens.pose, deterministic)
                temp_invalid = jnp.broadcast_to(invalid[:, :, None], (n_sc, n_tl, n_step))
                if step_invalid is not None:
                    temp_invalid = temp_invalid | step_invalid[None, None, :]
                feat = self.temp_encoder(feat, temp_invalid, deterministic=deterministic)
            # the static projections in tl_tokens.static_kv belong to the MAIN
            # encoder's tf_tl2tlmp params; the latent posterior/prior encoders
            # are separate instances and must not consume them
            skv = None if called_by_latent_encoder else tl_tokens.static_kv
            feat = self.tf_tl2tlmp(
                feat,
                src_padding_mask=invalid,
                tgt=None if skv is not None else tl_tokens.knn_tgt_tl2mp,
                tgt_padding_mask=tl_tokens.knn_invalid_tl2mp,
                rpe=None if skv is not None else tl_tokens.rpe_tl2mp,
                decoder_tgt_idx=tl_tokens.knn_idx_tl2tl,
                decoder_tgt_padding_mask=tl_tokens.knn_invalid_tl2tl,
                decoder_rpe=None if skv is not None else tl_tokens.rpe_tl2tl,
                deterministic=deterministic,
                static_kv=skv,
            )
            return feat

        # TrafficBots RNN mode
        if not called_by_latent_encoder:
            tl_state = tl_state[:, :, -1]
        return self._tl_feature(tl_state, tl_tokens.attr, tl_tokens.pose, deterministic)


class TrafficLightStatePredictor(nn.Module):
    """Next-step tl-state logits, clamped to ±3 (traffic_light.py:249-287)."""

    cfg: TlStatePredictorCfg
    hidden_dim: int
    tl_state_dim: int
    temp_window_size: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.temp_window_size <= 0:
            self.rnn = MultiAgentGRU(self.hidden_dim, self.cfg.n_layer, self.cfg.rnn_dropout_p, dtype=self.dtype)
        self.mlp = MLP(
            [self.hidden_dim] * (self.cfg.n_layer - 1) + [self.tl_state_dim],
            end_layer_activation=False,
            dtype=self.dtype,
        )

    def __call__(self, tl_token_feature, tl_token_invalid, rnn_hidden=None, deterministic: bool = True):
        """Returns (logits [n_sc, n_tl, tl_state_dim], new rnn_hidden or None)."""
        if self.cfg.detach_tl_feature:
            tl_token_feature = jax.lax.stop_gradient(tl_token_feature)
        new_hidden = None
        if self.temp_window_size <= 0:
            tl_token_feature, new_hidden = self.rnn(
                tl_token_feature,
                jnp.zeros_like(tl_token_invalid),
                rnn_hidden,
                deterministic=deterministic,
            )
        logits = self.mlp(tl_token_feature, tl_token_invalid, deterministic=deterministic)
        return jnp.clip(logits, -3.0, 3.0).astype(jnp.float32), new_hidden
