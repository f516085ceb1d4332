"""TrafficBots policy: wires map/tl/agent encoders, CVAE latent, navigation,
fusion heads and the action head.

Parity target: /root/reference/src/models/traffic_bots.py. The torch version
keeps a rolling history as module state (_append_hist); here the history
window is part of the simulator carry and every method is a pure function —
the rollout calls `model.apply(params, ..., method="step")` inside lax.scan.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from trafficbotsv15_tpu.config import ModelCfg
from trafficbotsv15_tpu.models.agent_encoder import AgentEncoder
from trafficbotsv15_tpu.models.heads import ActionHead, AddNaviLatent
from trafficbotsv15_tpu.models.latent_encoder import LatentEncoder
from trafficbotsv15_tpu.models.map_encoder import MapEncoder
from trafficbotsv15_tpu.models.navigation import NaviEncoder, NaviPredictor
from trafficbotsv15_tpu.models.tokens import MapTokens, TlTokens
from trafficbotsv15_tpu.models.traffic_light import TrafficLightEncoder, TrafficLightStatePredictor
from trafficbotsv15_tpu.ops.distributions import DiagGaussian
from trafficbotsv15_tpu.ops.pose_emb import PoseEmbConfig


class TrafficBots(nn.Module):
    cfg: ModelCfg
    time_step_gt: int
    action_dim: int = 2
    navi_dim: Optional[int] = None  # 8 for cmd, 4 for goal, None for dest/dummy
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.pose_rpe = PoseEmbConfig(
            mode=c.pose_rpe.mode, pe_dim=c.hidden_dim, theta_xy=c.pose_rpe.theta_xy, theta_cs=c.pose_rpe.theta_cs
        )
        common = dict(
            tf_cfg=c.tf_cfg,
            hidden_dim=c.hidden_dim,
            pairwise_relative=c.pairwise_relative,
            n_tgt_knn=c.n_tgt_knn,
            dist_limit=c.dist_limit,
            pose_rpe=self.pose_rpe,
            dtype=self.dtype,
        )
        temp_common = dict(
            temp_encoder_n_layer=c.mp_encoder.pl_encoder.n_layer,
            temp_encoder_pooling=c.mp_encoder.pl_encoder.pooling_mode,
            temp_encoder_dropout_p=c.mp_encoder.pl_encoder.mlp_dropout_p,
        )
        self.mp_encoder = MapEncoder(cfg=c.mp_encoder, **common)
        self.tl_encoder = TrafficLightEncoder(
            cfg=c.tl_encoder, tl_state_dim=5, tl_mode=c.tl_mode,
            temp_window_size=c.temp_window_size, **temp_common, **common,
        )
        self.tl_state_predictor = TrafficLightStatePredictor(
            cfg=c.tl_state_predictor, hidden_dim=c.hidden_dim, tl_state_dim=5,
            temp_window_size=c.temp_window_size, dtype=self.dtype,
        )
        self.ag_encoder = AgentEncoder(
            cfg=c.ag_encoder, temp_window_size=c.temp_window_size, **temp_common, **common,
        )
        self.latent_encoder = LatentEncoder(
            cfg=c.latent_encoder, tl_encoder_cfg=c.tl_encoder, ag_encoder_cfg=c.ag_encoder,
            tl_state_dim=5, tl_mode=c.tl_mode, temp_window_size=c.temp_window_size,
            time_step_gt=self.time_step_gt, **temp_common, **common,
        )
        mp_pe_dim = c.hidden_dim if c.mp_encoder.input_encoder.mode == "add" else c.hidden_dim // 2
        self.navi_encoder = NaviEncoder(
            cfg=c.navi_encoder, hidden_dim=c.hidden_dim, navi_mode=c.navi_mode, navi_dim=self.navi_dim,
            pairwise_relative=c.pairwise_relative,
            mp_pose_emb=PoseEmbConfig(
                mode=c.mp_encoder.pose_emb.mode, pe_dim=mp_pe_dim,
                theta_xy=c.mp_encoder.pose_emb.theta_xy, theta_cs=c.mp_encoder.pose_emb.theta_cs,
            ),
            pose_rpe=self.pose_rpe, dtype=self.dtype,
        )
        self.navi_predictor = NaviPredictor(
            cfg=c.navi_predictor, ag_encoder_cfg=c.ag_encoder, navi_mode=c.navi_mode, navi_dim=self.navi_dim,
            temp_window_size=c.temp_window_size, **temp_common, **common,
        )
        self.add_navi = AddNaviLatent(
            cfg=c.add_navi_latent, hidden_dim=c.hidden_dim, dummy=self.navi_encoder.dummy, dtype=self.dtype
        )
        self.add_latent = AddNaviLatent(
            cfg=c.add_navi_latent, hidden_dim=c.hidden_dim, dummy=self.latent_encoder.dummy, dtype=self.dtype
        )
        self.action_head = ActionHead(
            cfg=c.action_head, hidden_dim=c.hidden_dim, action_dim=self.action_dim, dtype=self.dtype
        )

    # --- per-phase entry points (used via nn.apply(..., method=...)) -------

    def encode_map(self, mp_valid, mp_attr, mp_pose, mp_type, deterministic: bool = True) -> MapTokens:
        return self.mp_encoder(mp_valid, mp_attr, mp_pose, mp_type, deterministic=deterministic)

    def precompute_tl(self, tl_valid, tl_attr, tl_pose, mp_tokens: MapTokens) -> TlTokens:
        return self.tl_encoder.precompute(tl_valid, tl_attr, tl_pose, mp_tokens)

    def encode_latent(self, ag_valid, ag_attr, ag_motion, ag_pose, ag_type, tl_state,
                      mp_tokens, tl_tokens, posterior: bool, deterministic: bool = True):
        return self.latent_encoder(
            ag_valid, ag_attr, ag_motion, ag_pose, ag_type, tl_state, mp_tokens, tl_tokens,
            posterior=posterior, deterministic=deterministic,
        )

    def predict_navi(self, ag_valid, ag_attr, ag_motion, ag_pose, ag_type, mp_tokens,
                     deterministic: bool = True):
        return self.navi_predictor(
            ag_valid, ag_attr, ag_motion, ag_pose, ag_type, mp_tokens, deterministic=deterministic
        )

    def step_tl(
        self,
        hist_tl_state,  # [n_sc, n_tl, W, 5]
        hist_step_invalid,  # [W] bool: unfilled window slots
        tl_tokens: TlTokens,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """TL feature + next-state logits for one history window.

        The TL subsystem (traffic_light.py:156-287) never sees agent state, so
        rollouts hoist it out of the main scan (sim/tl_prepass.py): batched
        over all steps when fully teacher-forced, or as a cheap TL-only scan
        on the un-replicated scenarios for the K-futures WOSAC workload.
        HPTR mode only (the RNN-mode predictor carries a GRU hidden).
        """
        assert self.cfg.temp_window_size > 0, "TL pre-pass requires HPTR mode"
        tl_token_feature = self.tl_encoder(
            hist_tl_state, tl_tokens, step_invalid=hist_step_invalid, deterministic=deterministic
        )
        tl_logits, _ = self.tl_state_predictor(
            tl_token_feature, tl_tokens.invalid, None, deterministic=deterministic
        )
        return tl_token_feature, tl_logits

    def step(
        self,
        ag_valid,  # [n_sc, n_ag] current-step valid
        hist_ag_valid,  # [n_sc, n_ag, W]
        hist_ag_pose,  # [n_sc, n_ag, W, 3]
        hist_ag_motion,  # [n_sc, n_ag, W, 3]
        hist_tl_state,  # [n_sc, n_tl, W, 5]
        hist_step_invalid,  # [W] bool: unfilled window slots
        ag_attr,  # [n_sc, n_ag, attr_dim]
        ag_type,  # [n_sc, n_ag, 3]
        ag_latent,  # [n_sc, n_ag, latent_dim] or None
        ag_latent_valid,  # [n_sc, n_ag] or None
        ag_navi,  # dest [n_sc, n_ag] int / goal [.., 4] / cmd [.., 8] / None
        ag_navi_valid,  # [n_sc, n_ag]
        tl_tokens: TlTokens,
        mp_tokens: MapTokens,
        rnn_hidden=None,  # RNN mode carry
        tl_rnn_hidden=None,
        deterministic: bool = True,
        tl_token_feature=None,  # [n_sc, n_tl, D] precomputed by the TL pre-pass
        token_rep: int = 1,  # K-futures dedup: mp_tokens / tl inputs carry the
        # UNIQUE scenarios [n_sc // token_rep, ...] shared by token_rep
        # consecutive agent rows (sim/rollout.py, PERF.md chain12)
    ) -> Tuple[DiagGaussian, jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        """One simulation step (traffic_bots.py:151-221).

        Returns (action_dist, tl_state_logits, rnn_hidden, tl_rnn_hidden).
        With a precomputed tl_token_feature the TL encoder/predictor are
        skipped and tl_state_logits is None (the pre-pass already has them).
        """
        navi_feature = self.navi_encoder(
            ag_navi, hist_ag_pose[:, :, -1], mp_tokens, deterministic=deterministic,
            mp_rep=token_rep,
        )

        tl_precomputed = tl_token_feature is not None
        assert token_rep == 1 or tl_precomputed, (
            "token dedup requires the TL pre-pass (the in-scan TL encoder "
            "consumes the full-batch history window)")
        if not tl_precomputed:
            tl_token_feature = self.tl_encoder(
                hist_tl_state, tl_tokens, step_invalid=hist_step_invalid, deterministic=deterministic
            )
        else:
            tl_token_feature = tl_token_feature.astype(self.dtype)

        ag_feature, rnn_hidden = self.ag_encoder(
            ag_valid=hist_ag_valid,
            ag_attr=ag_attr,
            ag_motion=hist_ag_motion,
            ag_pose=hist_ag_pose,
            mp_tokens=mp_tokens,
            tl_token_invalid=tl_tokens.invalid,
            tl_token_feature=tl_token_feature,
            tl_token_pose=tl_tokens.pose,
            rnn_hidden=rnn_hidden,
            deterministic=deterministic,
            token_rep=token_rep,
        )

        ag_feature = self.add_navi(ag_feature, navi_feature, ag_navi_valid, deterministic=deterministic)
        ag_feature = self.add_latent(ag_feature, ag_latent, ag_latent_valid, deterministic=deterministic)

        action_dist = self.action_head(ag_feature, ag_valid, ag_type, deterministic=deterministic)

        if tl_precomputed:
            # pre-pass mode: logits already computed outside the scan
            return action_dist, None, rnn_hidden, tl_rnn_hidden
        tl_logits, tl_rnn_hidden = self.tl_state_predictor(
            tl_token_feature, tl_tokens.invalid, tl_rnn_hidden, deterministic=deterministic
        )
        return action_dist, tl_logits, rnn_hidden, tl_rnn_hidden

    def __call__(self, *args, **kwargs):
        """Alias of step() so nn.Module init works with a single entry."""
        return self.step(*args, **kwargs)
