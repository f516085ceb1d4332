"""Map reference torch state_dicts onto this framework's flax param pytrees.

This is the bridge that lets the reference's ACTUAL trained weights (or any
torch-side instantiation of /root/reference/src/models/...) run inside the
flax stack: `tests/test_model_parity.py` uses it to golden-test every module
against the reference implementation, and it doubles as a checkpoint importer
for reference checkpoints (state_dict -> flax params).

Conventions (documenting every transpose):
  - torch nn.Linear stores weight [out, in]; flax Dense kernel is [in, out]
    => kernel = weight.T.
  - AttentionRPE (attention_rpe.py:36-44) fuses q/k/v into in_proj_weight
    [3d, d] (rows 0:d = q, d:3d = kv); our AttentionRPE keeps q_proj (Dense)
    and kv_w [d, 2d] separate => q_proj.kernel = W[:d].T, kv_w = W[d:].T.
    The chunk orders agree: torch chunks the projection OUTPUT along the last
    dim, which corresponds to column blocks of W.T.
  - linear_rpe [((3 if apply_q_rpe else 2))*d, d_rpe] => rpe_proj_w = W.T
    (or the rpe_proj Dense for the apply_q_rpe layout).
  - torch MLP wraps layers in one nn.Sequential whose indices skip
    activation/dropout slots; `mlp_linear_indices` reproduces the numbering
    from the constructor logic (mlp.py:34-56).
  - torch nn.GRU stacks gates row-wise [3h, .] in (reset, update, new) order
    with BOTH b_ih and b_hh; flax GRUCell has i-side biases only plus an
    hn bias => ir.bias = b_ih[r] + b_hh[r] (ditto z), in.bias = b_ih[n],
    hn.bias = b_hh[n] (the b_hn sits inside the r* product in both).
  - The per-layer cross-attn target LayerNorm (transformer_rpe.py norm_tgt)
    is algebraically folded into the kv projection on our side; its
    weight/bias map 1:1 onto the layer's norm_tgt_scale / norm_tgt_bias
    params (see models/transformer.py::standardize).

All functions take `sd`: a flat dict {torch param name -> np.ndarray} (a
state_dict where tensors were converted via .numpy(), or an npz namespace)
and return nested dicts matching flax's params structure. Mapped trees may
contain EXTRA leaves for call paths the flax init did not trace (e.g. both
norm_tgt layouts); use `conform` to intersect against an initialized
structure.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

Array = np.ndarray
SD = Dict[str, Array]


def _j(p: str, name: str) -> str:
    return p + "." + name if p else name


def _t(w: Array) -> Array:
    return np.ascontiguousarray(np.asarray(w).T)


def map_linear(sd: SD, p: str) -> dict:
    out = {"kernel": _t(sd[_j(p, "weight")])}
    if _j(p, "bias") in sd:
        out["bias"] = np.asarray(sd[_j(p, "bias")])
    return out


def map_layernorm(sd: SD, p: str) -> dict:
    return {"scale": np.asarray(sd[_j(p, "weight")]), "bias": np.asarray(sd[_j(p, "bias")])}


def mlp_linear_indices(
    n_lin: int, use_layernorm: bool, end_layer_activation: bool, dropout_p: float
) -> List[Tuple[int, Optional[int]]]:
    """Sequential indices of (Linear, LayerNorm) for each logical MLP layer,
    reproducing the reference constructor (mlp.py:34-56)."""
    idx, out = 0, []
    for i in range(n_lin):
        lin_idx, ln_idx = idx, None
        idx += 1
        if (i < n_lin - 1) or end_layer_activation:
            if use_layernorm:
                ln_idx = idx
                idx += 1
            idx += 1  # activation
        if dropout_p > 0:
            idx += 1  # dropout
        out.append((lin_idx, ln_idx))
    return out


def map_mlp(
    sd: SD,
    p: str,
    n_lin: int,
    use_layernorm: bool = False,
    end_layer_activation: bool = True,
    dropout_p: float = -1.0,
) -> dict:
    params = {}
    for i, (li, ln) in enumerate(
        mlp_linear_indices(n_lin, use_layernorm, end_layer_activation, dropout_p)
    ):
        params[f"fc{i}"] = map_linear(sd, _j(p, f"fc_layers.{li}"))
        if ln is not None:
            params[f"ln{i}"] = map_layernorm(sd, _j(p, f"fc_layers.{ln}"))
    return params


def map_attention(sd: SD, p: str, d_model: int, apply_q_rpe: bool = False) -> dict:
    """AttentionRPE params (attention_rpe.py:36-44) -> models.transformer.AttentionRPE."""
    w_in = np.asarray(sd[_j(p, "in_proj_weight")])  # [3d, d]
    out = {
        "q_proj": {"kernel": _t(w_in[:d_model])},
        "kv_w": _t(w_in[d_model:]),  # [d, 2d]; column blocks = (k, v)
        "out_proj": {"kernel": _t(sd[_j(p, "out_proj_weight")])},
    }
    if _j(p, "in_proj_bias") in sd:
        b_in = np.asarray(sd[_j(p, "in_proj_bias")])
        out["q_proj"]["bias"] = b_in[:d_model]
        out["kv_b"] = b_in[d_model:]
    if _j(p, "out_proj_bias") in sd:
        out["out_proj"]["bias"] = np.asarray(sd[_j(p, "out_proj_bias")])
    if _j(p, "linear_rpe.weight") in sd:
        if apply_q_rpe:
            # (rpe_q, rpe_k, rpe_v) layout lives in a single Dense on our side
            out["rpe_proj"] = map_linear(sd, _j(p, "linear_rpe"))
        else:
            out["rpe_proj_w"] = _t(sd[_j(p, "linear_rpe.weight")])
            out["rpe_proj_b"] = np.asarray(sd[_j(p, "linear_rpe.bias")])
    return out


def map_transformer_layer(sd: SD, p: str, d_model: int, mode: str, apply_q_rpe: bool = False) -> dict:
    """TransformerRPE (transformer_rpe.py:139-245) -> models.transformer.TransformerLayer.

    Emits BOTH norm_tgt layouts (the flax side creates norm_tgt_scale/bias on
    the KNN-target path and a norm_tgt LayerNorm on the dense path); conform()
    drops whichever was not traced.
    """
    out = {
        "norm1": map_layernorm(sd, _j(p, "norm1")),
        "norm2": map_layernorm(sd, _j(p, "norm2")),
        "attn": map_attention(sd, _j(p, "attn"), d_model, apply_q_rpe),
        "ffn1": map_linear(sd, _j(p, "linear1")),
        "ffn2": map_linear(sd, _j(p, "linear2")),
    }
    if _j(p, "norm_tgt.weight") in sd:
        ln = map_layernorm(sd, _j(p, "norm_tgt"))
        out["norm_tgt"] = ln
        out["norm_tgt_scale"] = ln["scale"]
        out["norm_tgt_bias"] = ln["bias"]
    if mode == "dec_cross_attn":
        out["norm_src"] = map_layernorm(sd, _j(p, "norm_src"))
        out["attn_src"] = map_attention(sd, _j(p, "attn_src"), d_model, apply_q_rpe)
    return out


def map_transformer_block(sd: SD, p: str, d_model: int, n_layer: int, mode: str, apply_q_rpe: bool = False) -> dict:
    out = {
        f"layer{i}": map_transformer_layer(sd, _j(p, f"layers.{i}"), d_model, mode, apply_q_rpe)
        for i in range(n_layer)
    }
    if _j(p, "out_layernorm.weight") in sd:
        out["out_ln"] = map_layernorm(sd, _j(p, "out_layernorm"))
    return out


def map_polyline_encoder(sd: SD, p: str, n_layer: int, use_layernorm: bool = False, dropout_p: float = -1.0) -> dict:
    """PointNet PolylineEncoder (polyline_encoder.py:27-34): each mlp_layers.{i}
    is MLP([h, h//2]) => one Linear (+LN) per level."""
    return {
        f"pointnet{i}": map_mlp(sd, _j(p, f"mlp_layers.{i}"), 1, use_layernorm, True, dropout_p)
        for i in range(n_layer)
    }


def map_input_encoder(sd: SD, p: str, n_layer: int, use_layernorm: bool = False, dropout_p: float = -1.0) -> dict:
    return {"mlp": map_mlp(sd, _j(p, "mlp"), n_layer, use_layernorm, False, dropout_p)}


def map_gru(sd: SD, p: str, n_layer: int, hidden: int) -> dict:
    """torch nn.GRU (multi_agent_gru.py:12) -> models.gru.MultiAgentGRU."""
    out = {}
    for k in range(n_layer):
        w_ih = np.asarray(sd[_j(p, f"rnn.weight_ih_l{k}")])  # [3h, in]
        w_hh = np.asarray(sd[_j(p, f"rnn.weight_hh_l{k}")])  # [3h, h]
        b_ih = np.asarray(sd[_j(p, f"rnn.bias_ih_l{k}")])
        b_hh = np.asarray(sd[_j(p, f"rnn.bias_hh_l{k}")])
        h = hidden
        out[f"gru{k}"] = {
            "ir": {"kernel": _t(w_ih[:h]), "bias": b_ih[:h] + b_hh[:h]},
            "iz": {"kernel": _t(w_ih[h : 2 * h]), "bias": b_ih[h : 2 * h] + b_hh[h : 2 * h]},
            "in": {"kernel": _t(w_ih[2 * h :]), "bias": b_ih[2 * h :]},
            "hr": {"kernel": _t(w_hh[:h])},
            "hz": {"kernel": _t(w_hh[h : 2 * h])},
            "hn": {"kernel": _t(w_hh[2 * h :]), "bias": b_hh[2 * h :]},
        }
    return out


def map_action_head(sd: SD, p: str, n_layer: int, branch_type: bool, use_layernorm: bool,
                    learned_log_std: bool, n_type: int = 3) -> dict:
    out = {}
    if branch_type:
        for i in range(n_type):
            out[f"mean{i}"] = map_mlp(sd, _j(p, f"mlp_mean.{i}"), n_layer, use_layernorm, False)
            if learned_log_std:
                out[f"log_std{i}"] = np.asarray(sd[_j(p, f"log_std.{i}")])
            else:
                out[f"log_std{i}"] = map_mlp(sd, _j(p, f"mlp_log_std.{i}"), n_layer, use_layernorm, False)
    else:
        out["mean"] = map_mlp(sd, _j(p, "mlp_mean"), n_layer, use_layernorm, False)
        if learned_log_std:
            out["log_std"] = np.asarray(sd[_j(p, "log_std")])
        else:
            out["log_std"] = map_mlp(sd, _j(p, "mlp_log_std"), n_layer, use_layernorm, False)
    return out


def map_add_navi_latent(sd: SD, p: str, n_layer: int, use_layernorm: bool, dropout_p: float) -> dict:
    if _j(p, "mlp_in.fc_layers.0.weight") not in sd:
        return {}  # dummy
    return {
        "mlp_in": map_mlp(sd, _j(p, "mlp_in"), n_layer, use_layernorm, True, dropout_p),
        "mlp": map_mlp(sd, _j(p, "mlp"), n_layer, use_layernorm, True, dropout_p),
    }


def map_dist_encoder(sd: SD, p: str, dist_type: str, n_layer: int, branch_type: bool,
                     use_layernorm: bool, learned_log_std: bool) -> dict:
    """DistEncoder (latent_encoder.py:125-253) -> models.latent_encoder.DistEncoder."""
    out = {}
    if dist_type in ("std_gaus", "std_cat"):
        return out  # constant (non-trainable) params on the torch side; none on ours
    if dist_type == "diag_gaus":
        if branch_type:
            for i in range(3):
                out[f"mean{i}"] = map_mlp(sd, _j(p, f"mlp_mean.{i}"), n_layer, use_layernorm, False)
                if learned_log_std:
                    out[f"log_std{i}"] = np.asarray(sd[_j(p, f"log_std.{i}")])
                else:
                    out[f"log_std{i}"] = map_mlp(sd, _j(p, f"mlp_log_std.{i}"), n_layer, use_layernorm, False)
        else:
            out["mean"] = map_mlp(sd, _j(p, "mlp_mean"), n_layer, use_layernorm, False)
            if learned_log_std:
                out["log_std"] = np.asarray(sd[_j(p, "log_std")])
            else:
                out["log_std"] = map_mlp(sd, _j(p, "mlp_log_std"), n_layer, use_layernorm, False)
    elif dist_type == "cat":
        if branch_type:
            for i in range(3):
                out[f"logits{i}"] = map_mlp(sd, _j(p, f"mlp_logits.{i}"), n_layer, use_layernorm, False)
        else:
            out["logits"] = map_mlp(sd, _j(p, "mlp_logits"), n_layer, use_layernorm, False)
    else:
        raise NotImplementedError(dist_type)
    return out


def map_tl_predictor(sd: SD, p: str, n_layer: int, hidden: int, temp_window_size: int) -> dict:
    out = {"mlp": map_mlp(sd, _j(p, "mlp"), n_layer, False, False)}
    if temp_window_size <= 0:
        out["rnn"] = map_gru(sd, _j(p, "rnn"), n_layer, hidden)
    return out


# --------------------------------------------------------------- composites


def map_map_encoder(sd: SD, p: str, cfg, d_model: int, apply_q_rpe: bool = False) -> dict:
    """MapEncoder (map_encoder.py:14-48); cfg is config.MapEncoderCfg."""
    return {
        "input_encoder": map_input_encoder(
            sd, _j(p, "input_encoder"), cfg.input_encoder.n_layer,
            cfg.input_encoder.mlp_use_layernorm, cfg.input_encoder.mlp_dropout_p,
        ),
        "pl_encoder": map_polyline_encoder(
            sd, _j(p, "pl_encoder"), cfg.pl_encoder.n_layer,
            cfg.pl_encoder.mlp_use_layernorm, cfg.pl_encoder.mlp_dropout_p,
        ),
        "tf_mp2mp": map_transformer_block(
            sd, _j(p, "tf_mp2mp"), d_model, cfg.n_layer_tf, "enc_self_attn", apply_q_rpe
        ),
    }


def map_tl_encoder(sd: SD, p: str, cfg, d_model: int, temp_window_size: int,
                   pl_cfg, apply_q_rpe: bool = False) -> dict:
    """TrafficLightEncoder (traffic_light.py:15-77); cfg=TlEncoderCfg,
    pl_cfg=the mp_encoder.pl_encoder cfg reused as temp_encoder."""
    out = {
        "input_encoder": map_input_encoder(
            sd, _j(p, "input_encoder"), cfg.input_encoder.n_layer,
            cfg.input_encoder.mlp_use_layernorm, cfg.input_encoder.mlp_dropout_p,
        ),
    }
    if temp_window_size > 0:
        if not cfg.temp_stack_input:
            out["temp_encoder"] = map_polyline_encoder(
                sd, _j(p, "temp_encoder"), pl_cfg.n_layer,
                pl_cfg.mlp_use_layernorm, pl_cfg.mlp_dropout_p,
            )
        out["tf_tl2tlmp"] = map_transformer_block(
            sd, _j(p, "tf_tl2tlmp"), d_model, cfg.n_layer_tf, "dec_cross_attn", apply_q_rpe
        )
    return out


def map_agent_encoder(sd: SD, p: str, cfg, d_model: int, temp_window_size: int,
                      pl_cfg, hidden: int, apply_q_rpe: bool = False) -> dict:
    """AgentEncoder (agent_encoder.py:16-73); cfg=AgEncoderCfg."""
    out = {
        "input_encoder": map_input_encoder(
            sd, _j(p, "input_encoder"), cfg.input_encoder.n_layer,
            cfg.input_encoder.mlp_use_layernorm, cfg.input_encoder.mlp_dropout_p,
        ),
    }
    if temp_window_size > 0:
        out["temp_encoder"] = map_polyline_encoder(
            sd, _j(p, "temp_encoder"), pl_cfg.n_layer, pl_cfg.mlp_use_layernorm, pl_cfg.mlp_dropout_p
        )
        out["tf_ag2agmptl"] = map_transformer_block(
            sd, _j(p, "tf_ag2agmptl"), d_model, cfg.n_layer_tf, "dec_cross_attn", apply_q_rpe
        )
    else:
        out["temp_encoder"] = map_gru(sd, _j(p, "temp_encoder"), pl_cfg.n_layer, hidden)
        for name in ("tf_ag2mp", "tf_ag2tl"):
            out[name] = map_transformer_block(sd, _j(p, f"{name}"), d_model, cfg.n_layer_tf, "enc_cross_attn", apply_q_rpe)
        out["tf_ag2ag"] = map_transformer_block(sd, _j(p, "tf_ag2ag"), d_model, cfg.n_layer_tf, "enc_self_attn", apply_q_rpe)
    return out


def map_latent_encoder(sd: SD, p: str, cfg, tl_cfg, ag_cfg, d_model: int,
                       latent_window: int, pl_cfg, hidden: int, apply_q_rpe: bool = False) -> dict:
    """LatentEncoder (latent_encoder.py:14-122); cfg=LatentEncoderCfg."""
    if cfg.latent_dim <= 0:
        return {}
    out = {}
    names = [("tl_encoder_post", "tl"), ("ag_encoder_post", "ag")]
    if not cfg.share_post_prior_encoders:
        names += [("tl_encoder_prior", "tl"), ("ag_encoder_prior", "ag")]
    for name, kind in names:
        if kind == "tl":
            out[name] = map_tl_encoder(sd, _j(p, f"{name}"), tl_cfg, d_model, latent_window, pl_cfg, apply_q_rpe)
        else:
            out[name] = map_agent_encoder(sd, _j(p, f"{name}"), ag_cfg, d_model, latent_window, pl_cfg, hidden, apply_q_rpe)
    for ours, theirs, dcfg in (
        ("dist_post", "latent_dist_post", cfg.latent_post),
        ("dist_prior", "latent_dist_prior", cfg.latent_prior),
    ):
        mapped = map_dist_encoder(
            sd, _j(p, f"{theirs}"), dcfg.dist_type, dcfg.n_layer, dcfg.branch_type,
            dcfg.mlp_use_layernorm, dcfg.log_std is not None,
        )
        if mapped:
            out[ours] = mapped
    return out


def map_navi_encoder(sd: SD, p: str, navi_mode: str, pairwise_relative: bool) -> dict:
    if navi_mode == "dummy":
        return {}
    if navi_mode == "dest":
        out = {"mlp_mp": map_mlp(sd, _j(p, "mlp_mp"), 1, False, False)}
        if pairwise_relative:
            out["mlp_pe"] = map_mlp(sd, _j(p, "mlp_pe"), 1, False, False)
        return out
    return {"mlp": map_mlp(sd, _j(p, "mlp"), 1, False, False)}  # goal / cmd


def map_navi_predictor(sd: SD, p: str, cfg, ag_cfg, d_model: int, temp_window_size: int,
                       pl_cfg, hidden: int, navi_mode: str, apply_q_rpe: bool = False) -> dict:
    """NaviPredictor (navigation.py:103-190); cfg=NaviPredictorCfg."""
    if navi_mode == "dummy":
        return {}
    out = {
        "input_encoder": map_input_encoder(
            sd, _j(p, "input_encoder"), ag_cfg.input_encoder.n_layer,
            ag_cfg.input_encoder.mlp_use_layernorm, ag_cfg.input_encoder.mlp_dropout_p,
        ),
        "mlp": map_mlp(sd, _j(p, "mlp"), cfg.n_layer_mlp, cfg.mlp_use_layernorm, False),
    }
    if temp_window_size > 0:
        out["temp_encoder"] = map_polyline_encoder(
            sd, _j(p, "temp_encoder"), pl_cfg.n_layer, pl_cfg.mlp_use_layernorm, pl_cfg.mlp_dropout_p
        )
    else:
        out["temp_encoder"] = map_gru(sd, _j(p, "temp_encoder"), pl_cfg.n_layer, hidden)
    if navi_mode != "dest":
        out["tf_ag2mp"] = map_transformer_block(
            sd, _j(p, "tf_ag2mp"), d_model, cfg.n_layer_tf, "enc_cross_attn", apply_q_rpe
        )
        if navi_mode == "goal":
            out["log_std"] = np.asarray(sd[_j(p, "log_std")])
    return out


def map_traffic_bots(sd: SD, cfg, time_step_gt: int) -> dict:
    """Full TrafficBots (traffic_bots.py:17-121) -> models.traffic_bots.TrafficBots.

    cfg is config.ModelCfg; prefixes are the torch attribute names ('' root).
    """
    c = cfg
    d = c.tf_cfg.d_model
    q = c.tf_cfg.apply_q_rpe
    pl = c.mp_encoder.pl_encoder
    rate = c.latent_encoder.temporal_down_sample_rate
    if c.temp_window_size > 0:
        latent_window = (time_step_gt + 1) // rate + 1 if rate > 1 else time_step_gt + 1
    else:
        latent_window = c.temp_window_size
    out = {
        "mp_encoder": map_map_encoder(sd, "mp_encoder", c.mp_encoder, d, q),
        "tl_encoder": map_tl_encoder(sd, "tl_encoder", c.tl_encoder, d, c.temp_window_size, pl, q),
        "tl_state_predictor": map_tl_predictor(
            sd, "tl_state_predictor", c.tl_state_predictor.n_layer, c.hidden_dim, c.temp_window_size
        ),
        "ag_encoder": map_agent_encoder(sd, "ag_encoder", c.ag_encoder, d, c.temp_window_size, pl, c.hidden_dim, q),
        "action_head": map_action_head(
            sd, "action_head", c.action_head.n_layer, c.action_head.branch_type,
            c.action_head.mlp_use_layernorm, c.action_head.log_std is not None,
        ),
    }
    latent = map_latent_encoder(
        sd, "latent_encoder", c.latent_encoder, c.tl_encoder, c.ag_encoder, d, latent_window, pl, c.hidden_dim, q
    )
    if latent:
        out["latent_encoder"] = latent
    navi_enc = map_navi_encoder(sd, "navi_encoder", c.navi_mode, c.pairwise_relative)
    if navi_enc:
        out["navi_encoder"] = navi_enc
    navi_pred = map_navi_predictor(
        sd, "navi_predictor", c.navi_predictor, c.ag_encoder, d, c.temp_window_size, pl, c.hidden_dim, c.navi_mode, q
    )
    if navi_pred:
        out["navi_predictor"] = navi_pred
    for name in ("add_navi", "add_latent"):
        mapped = map_add_navi_latent(
            sd, name, c.add_navi_latent.n_layer, c.add_navi_latent.mlp_use_layernorm,
            c.add_navi_latent.mlp_dropout_p,
        )
        if mapped:
            out[name] = mapped
    return out


def conform(mapped: dict, target) -> dict:
    """Intersect a mapped tree against an initialized flax param structure.

    Keeps exactly the leaves present in `target`; raises KeyError with the
    full path if the mapping is missing one (a transpose/naming bug, not a
    tolerable difference). Extra mapped leaves (untraced call paths) drop.
    """

    def rec(m, t, path):
        if isinstance(t, dict):
            if not isinstance(m, dict):
                raise KeyError(f"mapping at {path or '<root>'} is a leaf but target is a dict "
                               f"with keys {sorted(t)}")
            out = {}
            for k, tv in t.items():
                if k not in m:
                    raise KeyError(f"mapping missing param {path + '/' + k}")
                out[k] = rec(m[k], tv, path + "/" + k)
            return out
        leaf = np.asarray(m)
        tshape = tuple(getattr(t, "shape", np.shape(t)))
        if tuple(leaf.shape) != tshape:
            raise KeyError(f"shape mismatch at {path}: mapped {leaf.shape} vs target {tshape}")
        return leaf.astype(np.asarray(t).dtype if hasattr(t, "dtype") else np.float32)

    return rec(mapped, target, "")
