#!/usr/bin/env python
"""Generate model-parity goldens from the reference's ACTUAL torch modules.

Runs /root/reference/src/models/... (plain torch nn.Modules, torch CPU) on
synthetic inputs and saves (state_dict, inputs, outputs) npz files under
tests/golden/model/. tests/test_model_parity.py replays each case through the
flax stack with weights mapped via utils/torch_import.py and asserts numeric
parity — the same offline-golden pattern the ETL parity suite uses
(scripts/gen_etl_golden.py).

The reference imports omegaconf/transforms3d which are absent from this
image; both are stubbed before import (DictConfig is only used as a type
annotation plus attribute/dict access, transforms3d only by numpy helpers we
never call).

Usage: python scripts/gen_model_golden.py
"""

from __future__ import annotations

import json
import sys
import types
from pathlib import Path

import numpy as np
import torch


class DotDict(dict):
    """dict with attribute access — stands in for omegaconf.DictConfig."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v


_om = types.ModuleType("omegaconf")
_om.DictConfig = DotDict
sys.modules.setdefault("omegaconf", _om)
sys.modules.setdefault("transforms3d", types.ModuleType("transforms3d"))
sys.path.insert(0, "/root/reference/src")

from models.modules.attention_rpe import AttentionRPE  # noqa: E402
from models.modules.transformer_rpe import TransformerBlockRPE  # noqa: E402
from models.modules.mlp import MLP  # noqa: E402
from models.modules.input_encoder import InputEncoder  # noqa: E402
from models.modules.polyline_encoder import PolylineEncoder  # noqa: E402
from models.modules.multi_agent_gru import MultiAgentGRULoop  # noqa: E402
from models.modules.action_head import ActionHead  # noqa: E402
from models.modules.add_navi_latent import AddNaviLatent  # noqa: E402
from models.latent_encoder import DistEncoder  # noqa: E402
from models.navigation import NaviPredictor  # noqa: E402
from models.traffic_bots import TrafficBots  # noqa: E402
from models.traffic_light import TrafficLightEncoder, TrafficLightStatePredictor  # noqa: E402
from utils.pose_emb import PoseEmb  # noqa: E402

OUT = Path(__file__).resolve().parents[1] / "tests" / "golden" / "model"
RNG = np.random.default_rng(20260819)

D, H = 64, 4  # primitive-case dims: d_model 64, 4 heads (d_head 16)


def _np(x):
    if isinstance(x, torch.Tensor):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def save(name, module, inputs, outputs, meta=None):
    arrs = {}
    if module is not None:
        for k, v in module.state_dict().items():
            arrs[f"sd/{k}"] = _np(v)
    for k, v in inputs.items():
        if v is not None:
            arrs[f"in/{k}"] = _np(v)
    for k, v in outputs.items():
        if v is not None:
            arrs[f"out/{k}"] = _np(v)
    arrs["meta"] = np.frombuffer(json.dumps(meta or {}).encode(), dtype=np.uint8)
    OUT.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT / f"{name}.npz", **arrs)
    n_param = 0 if module is None else sum(p.numel() for p in module.state_dict().values())
    print(f"  {name}: {n_param} params, {len(arrs)} arrays")


def t32(a):
    return torch.tensor(np.asarray(a, np.float32))


def rand(*shape, scale=1.0):
    return (RNG.standard_normal(shape) * scale).astype(np.float32)


def rand_valid(*shape, p=0.85):
    return RNG.random(shape) < p


# ------------------------------------------------------------- primitives


def gen_mlp():
    torch.manual_seed(0)
    m = MLP([32, 48, 48, 16], dropout_p=0.1, use_layernorm=True, end_layer_activation=True).eval()
    x = rand(3, 7, 32)
    invalid = ~rand_valid(3, 7)
    y = m(t32(x), torch.tensor(invalid))
    save("mlp_ln", m, {"x": x, "invalid": invalid}, {"y": y},
         {"fc_dims": [48, 48, 16], "use_layernorm": True, "dropout_p": 0.1})

    torch.manual_seed(1)
    m2 = MLP([32, 48, 16], end_layer_activation=False, init_bias=-2.0).eval()
    y2 = m2(t32(x))
    save("mlp_plain", m2, {"x": x}, {"y": y2},
         {"fc_dims": [48, 16], "end_layer_activation": False})


def gen_input_encoder():
    for mode in ("input", "cat", "add"):
        torch.manual_seed(2)
        pe_dim = D if mode == "add" else 24
        m = InputEncoder(hidden_dim=D, attr_dim=17, pe_dim=pe_dim, n_layer=3,
                         mlp_dropout_p=0.0, mlp_use_layernorm=False, mode=mode).eval()
        attr, pe = rand(2, 9, 17), rand(2, 9, pe_dim)
        y = m(t32(attr), t32(pe))
        save(f"input_encoder_{mode}", m, {"attr": attr, "pe": pe}, {"y": y},
             {"mode": mode, "pe_dim": pe_dim, "n_layer": 3})


def gen_polyline_encoder():
    torch.manual_seed(3)
    m = PolylineEncoder(hidden_dim=D, tf_cfg=None, n_layer=3, mlp_use_layernorm=False,
                        mlp_dropout_p=0.1, use_pointnet=True, pooling_mode="max_valid").eval()
    x = rand(2, 6, 10, D)
    invalid = ~rand_valid(2, 6, 10)
    invalid[0, 0] = True  # fully invalid polyline
    invalid[1, 2, 5:] = True
    y = m(t32(x), torch.tensor(invalid))
    save("polyline_encoder", m, {"x": x, "invalid": invalid}, {"y": y},
         {"n_layer": 3, "pooling_mode": "max_valid"})


def gen_attention():
    # dense self-attention with an all-invalid batch entry (NaN guard path)
    torch.manual_seed(4)
    m = AttentionRPE(d_model=D, n_head=H, dropout_p=0.1).eval()
    src = rand(3, 8, D)
    pad = ~rand_valid(3, 8)
    pad[2] = True
    y, _ = m(t32(src), tgt_padding_mask=torch.tensor(pad))
    save("attn_dense_self", m, {"src": src, "pad": pad}, {"y": y}, {"d_model": D, "n_head": H})

    # dense cross-attention (3D tgt)
    torch.manual_seed(5)
    m = AttentionRPE(d_model=D, n_head=H, dropout_p=0.1).eval()
    src, tgt = rand(2, 5, D), rand(2, 9, D)
    pad = ~rand_valid(2, 9)
    y, _ = m(t32(src), t32(tgt), tgt_padding_mask=torch.tensor(pad))
    save("attn_dense_cross", m, {"src": src, "tgt": tgt, "pad": pad}, {"y": y},
         {"d_model": D, "n_head": H})

    # KNN (4D tgt, no rpe) with an all-invalid source row
    torch.manual_seed(6)
    m = AttentionRPE(d_model=D, n_head=H, dropout_p=0.1).eval()
    src, tgt = rand(2, 6, D), rand(2, 6, 4, D)
    pad = ~rand_valid(2, 6, 4)
    pad[0, 1] = True
    y, _ = m(t32(src), t32(tgt), tgt_padding_mask=torch.tensor(pad))
    save("attn_knn", m, {"src": src, "tgt": tgt, "pad": pad}, {"y": y}, {"d_model": D, "n_head": H})

    # KNN + rpe
    for q_rpe in (False, True):
        torch.manual_seed(7)
        m = AttentionRPE(d_model=D, n_head=H, dropout_p=0.1, d_rpe=40, apply_q_rpe=q_rpe).eval()
        src, tgt, rpe = rand(2, 6, D), rand(2, 6, 4, D), rand(2, 6, 4, 40)
        pad = ~rand_valid(2, 6, 4)
        y, _ = m(t32(src), t32(tgt), tgt_padding_mask=torch.tensor(pad), rpe=t32(rpe))
        save(f"attn_rpe{'_q' if q_rpe else ''}", m, {"src": src, "tgt": tgt, "pad": pad, "rpe": rpe},
             {"y": y}, {"d_model": D, "n_head": H, "d_rpe": 40, "apply_q_rpe": q_rpe})


def gen_transformer_blocks():
    tf_kw = dict(d_model=D, n_head=H, k_feedforward=4, dropout_p=0.1, bias=True,
                 activation="relu", out_layernorm=False, apply_q_rpe=False)

    # enc_self_attn with int64 KNN indices + rpe (the mp2mp pattern)
    torch.manual_seed(8)
    m = TransformerBlockRPE(n_layer=2, mode="enc_self_attn", d_rpe=40, **tf_kw).eval()
    n_b, n_src, k = 2, 24, 6
    src = rand(n_b, n_src, D)
    src_pad = ~rand_valid(n_b, n_src, p=0.9)
    idx = np.stack([RNG.permutation(n_src)[:k] for _ in range(n_b * n_src)]).reshape(n_b, n_src, k)
    knn_pad = ~rand_valid(n_b, n_src, k)
    rpe = rand(n_b, n_src, k, 40)
    y, _ = m(t32(src), src_padding_mask=torch.tensor(src_pad), tgt=torch.tensor(idx, dtype=torch.int64),
             tgt_padding_mask=torch.tensor(knn_pad), rpe=t32(rpe))
    save("tfblock_enc_self_knn", m, {"src": src, "src_pad": src_pad, "idx": idx,
                                     "knn_pad": knn_pad, "rpe": rpe},
         {"y": y}, {"n_layer": 2, "mode": "enc_self_attn", "d_rpe": 40, **tf_kw})

    # enc_cross_attn with 4D KNN targets + rpe (the ag2mp pattern)
    torch.manual_seed(9)
    m = TransformerBlockRPE(n_layer=2, mode="enc_cross_attn", d_rpe=40, **tf_kw).eval()
    src = rand(2, 7, D)
    src_pad = ~rand_valid(2, 7, p=0.9)
    tgt = rand(2, 7, 5, D)
    tgt_pad = ~rand_valid(2, 7, 5)
    rpe = rand(2, 7, 5, 40)
    y, _ = m(t32(src), src_padding_mask=torch.tensor(src_pad), tgt=t32(tgt),
             tgt_padding_mask=torch.tensor(tgt_pad), rpe=t32(rpe))
    save("tfblock_enc_cross", m, {"src": src, "src_pad": src_pad, "tgt": tgt,
                                  "tgt_pad": tgt_pad, "rpe": rpe},
         {"y": y}, {"n_layer": 2, "mode": "enc_cross_attn", "d_rpe": 40, **tf_kw})

    # dec_cross_attn: decoder self-attn over int64 idx + cross to 4D targets
    torch.manual_seed(10)
    m = TransformerBlockRPE(n_layer=2, mode="dec_cross_attn", d_rpe=40, **tf_kw).eval()
    n_b, n_src, k_dec, k_cross = 2, 16, 5, 6
    src = rand(n_b, n_src, D)
    src_pad = ~rand_valid(n_b, n_src, p=0.9)
    tgt = rand(n_b, n_src, k_cross, D)
    tgt_pad = ~rand_valid(n_b, n_src, k_cross)
    rpe = rand(n_b, n_src, k_cross, 40)
    dec_idx = np.stack([RNG.permutation(n_src)[:k_dec] for _ in range(n_b * n_src)]).reshape(n_b, n_src, k_dec)
    dec_pad = ~rand_valid(n_b, n_src, k_dec)
    dec_rpe = rand(n_b, n_src, k_dec, 40)
    y, _ = m(t32(src), src_padding_mask=torch.tensor(src_pad), tgt=t32(tgt),
             tgt_padding_mask=torch.tensor(tgt_pad), rpe=t32(rpe),
             decoder_tgt=torch.tensor(dec_idx, dtype=torch.int64),
             decoder_tgt_padding_mask=torch.tensor(dec_pad), decoder_rpe=t32(dec_rpe))
    save("tfblock_dec_cross", m, {"src": src, "src_pad": src_pad, "tgt": tgt, "tgt_pad": tgt_pad,
                                  "rpe": rpe, "dec_idx": dec_idx, "dec_pad": dec_pad, "dec_rpe": dec_rpe},
         {"y": y}, {"n_layer": 2, "mode": "dec_cross_attn", "d_rpe": 40, **tf_kw})

    # plain dense self-attn block (PolylineEncoder transformer alternative)
    torch.manual_seed(11)
    m = TransformerBlockRPE(n_layer=2, mode="enc_self_attn", d_rpe=-1, **{**tf_kw, "out_layernorm": True}).eval()
    src = rand(2, 10, D)
    src_pad = ~rand_valid(2, 10)
    y, _ = m(t32(src), src_padding_mask=torch.tensor(src_pad))
    save("tfblock_dense_self", m, {"src": src, "src_pad": src_pad}, {"y": y},
         {"n_layer": 2, "mode": "enc_self_attn", "d_rpe": -1, **{**tf_kw, "out_layernorm": True}})


def gen_gru():
    torch.manual_seed(12)
    m = MultiAgentGRULoop(hidden_dim=D, n_layer=2, dropout_p=0.1).eval()
    # step mode with carried hidden
    x = rand(2, 5, D)
    invalid = ~rand_valid(2, 5)
    h = rand(2, 2 * 5, D, scale=0.5)
    y, h1 = m(t32(x), torch.tensor(invalid), t32(h))
    save("gru_step", m, {"x": x, "invalid": invalid, "h": h}, {"y": y, "h1": h1},
         {"n_layer": 2, "hidden": D})
    # sequence mode
    xs = rand(2, 5, 7, D)
    inv_s = ~rand_valid(2, 5, 7)
    ys, _ = m(t32(xs), torch.tensor(inv_s))
    save("gru_seq", m, {"x": xs, "invalid": inv_s}, {"y": ys}, {"n_layer": 2, "hidden": D})


def gen_heads():
    ag_type = np.eye(3, dtype=bool)[RNG.integers(0, 3, size=(2, 9))]
    valid = rand_valid(2, 9)
    x = rand(2, 9, D)

    torch.manual_seed(13)
    m = ActionHead(hidden_dim=D, action_dim=2, n_layer=3, mlp_use_layernorm=False,
                   log_std=-2.0, branch_type=True).eval()
    dist = m(t32(x), torch.tensor(valid), torch.tensor(ag_type))
    save("action_head_branch", m, {"x": x, "valid": valid, "ag_type": ag_type},
         {"mean": dist.mean, "std": dist.stddev},
         {"n_layer": 3, "branch_type": True, "log_std": -2.0})

    torch.manual_seed(14)
    m = ActionHead(hidden_dim=D, action_dim=2, n_layer=3, mlp_use_layernorm=True,
                   log_std=None, branch_type=False).eval()
    dist = m(t32(x), torch.tensor(valid), torch.tensor(ag_type))
    save("action_head_mlp_std", m, {"x": x, "valid": valid, "ag_type": ag_type},
         {"mean": dist.mean, "std": dist.stddev},
         {"n_layer": 3, "branch_type": False, "log_std": None, "mlp_use_layernorm": True})

    z_valid = rand_valid(2, 9)
    z = rand(2, 9, 24)
    for mode in ("cat", "add", "mul"):
        torch.manual_seed(15)
        m = AddNaviLatent(hidden_dim=D, in_dim=24, dummy=False, mode=mode, n_layer=2,
                          mlp_use_layernorm=False, mlp_dropout_p=0.1, res_add=(mode == "cat")).eval()
        y = m(t32(x), t32(z), torch.tensor(z_valid))
        save(f"add_navi_{mode}", m, {"x": x, "z": z, "z_valid": z_valid}, {"y": y},
             {"mode": mode, "n_layer": 2, "res_add": mode == "cat"})


def gen_dist_encoder():
    ag_type = np.eye(3, dtype=bool)[RNG.integers(0, 3, size=(2, 9))]
    valid = rand_valid(2, 9)
    x = rand(2, 9, D)

    torch.manual_seed(16)
    m = DistEncoder(hidden_dim=D, out_dim=16, branch_type=False, dist_type="diag_gaus",
                    mlp_use_layernorm=False, log_std=0.0, n_cat=8, n_layer=3).eval()
    dist = m(t32(x), torch.tensor(valid), torch.tensor(ag_type))
    save("dist_enc_diag_gaus", m, {"x": x, "valid": valid, "ag_type": ag_type},
         {"mean": dist.mean, "std": dist.stddev},
         {"dist_type": "diag_gaus", "n_layer": 3, "branch_type": False, "log_std": 0.0})

    torch.manual_seed(17)
    m = DistEncoder(hidden_dim=D, out_dim=16, branch_type=True, dist_type="cat",
                    mlp_use_layernorm=False, log_std=None, n_cat=8, n_layer=3).eval()
    dist = m(t32(x), torch.tensor(valid), torch.tensor(ag_type))
    save("dist_enc_cat_branch", m, {"x": x, "valid": valid, "ag_type": ag_type},
         {"logits": dist.logits},
         {"dist_type": "cat", "n_layer": 3, "branch_type": True, "n_cat": 8})


def gen_tl_predictor():
    torch.manual_seed(18)
    m = TrafficLightStatePredictor(hidden_dim=D, tl_state_dim=5, n_layer=3,
                                   rnn_dropout_p=0.1, temp_window_size=11, detach_tl_feature=True).eval()
    x = rand(2, 9, D)
    invalid = ~rand_valid(2, 9)
    y = m(t32(x), torch.tensor(invalid))
    save("tl_predictor_hptr", m, {"x": x, "invalid": invalid}, {"y": y},
         {"n_layer": 3, "temp_window_size": 11})


def gen_dist_encoder_variants():
    """The remaining DistEncoder heads (latent_encoder.py:125-253): plain cat,
    parameter-free std_cat (incl. MultiCategorical.log_prob semantics), and the
    branched diag_gaus with MLP log-std (VERDICT r4 missing #2)."""
    ag_type = np.eye(3, dtype=bool)[RNG.integers(0, 3, size=(2, 9))]
    valid = rand_valid(2, 9)
    x = rand(2, 9, D)

    torch.manual_seed(19)
    m = DistEncoder(hidden_dim=D, out_dim=16, branch_type=False, dist_type="cat",
                    mlp_use_layernorm=False, log_std=None, n_cat=8, n_layer=3).eval()
    dist = m(t32(x), torch.tensor(valid), torch.tensor(ag_type))
    save("dist_enc_cat_plain", m, {"x": x, "valid": valid, "ag_type": ag_type},
         {"logits": dist.logits},
         {"dist_type": "cat", "n_layer": 3, "branch_type": False, "n_cat": 8})

    # std_cat is parameter-free (constant zero logits): pin the logits AND
    # the MultiCategorical.log_prob of a fixed one-hot sample
    torch.manual_seed(20)
    m = DistEncoder(hidden_dim=D, out_dim=16, branch_type=False, dist_type="std_cat",
                    mlp_use_layernorm=False, log_std=None, n_cat=8, n_layer=3).eval()
    dist = m(t32(x), torch.tensor(valid), torch.tensor(ag_type))
    sample_idx = RNG.integers(0, 2, size=(2, 9, 8))
    sample = np.eye(2, dtype=np.float32)[sample_idx].reshape(2, 9, 16)
    lp = dist.log_prob(t32(sample))
    save("dist_enc_std_cat", None, {"x": x, "valid": valid, "ag_type": ag_type, "sample": sample},
         {"logits": dist.logits, "log_prob": lp},
         {"dist_type": "std_cat", "n_cat": 8})

    torch.manual_seed(21)
    m = DistEncoder(hidden_dim=D, out_dim=16, branch_type=True, dist_type="diag_gaus",
                    mlp_use_layernorm=False, log_std=None, n_cat=8, n_layer=3).eval()
    dist = m(t32(x), torch.tensor(valid), torch.tensor(ag_type))
    save("dist_enc_diag_gaus_branch", m, {"x": x, "valid": valid, "ag_type": ag_type},
         {"mean": dist.mean, "std": dist.stddev},
         {"dist_type": "diag_gaus", "n_layer": 3, "branch_type": True, "log_std": None})


def _mp_tokens_rand(n_sc, n_mp):
    """Random token-level map features with well-separated poses."""
    mp_invalid = ~rand_valid(n_sc, n_mp, p=0.9)
    mp_feature = rand(n_sc, n_mp, D)
    mp_pose = np.concatenate(
        [RNG.uniform(-80, 80, (n_sc, n_mp, 2)), RNG.uniform(-np.pi, np.pi, (n_sc, n_mp, 1))], -1
    ).astype(np.float32)
    mp_type = np.eye(11, dtype=bool)[RNG.integers(0, 11, size=(n_sc, n_mp))]
    return mp_invalid, mp_feature, mp_pose, mp_type


def _tracks_rand(n_sc, n_ag, n_step):
    ag_valid = np.zeros((n_sc, n_ag, n_step), bool)
    ag_pose = np.zeros((n_sc, n_ag, n_step, 3), np.float32)
    ag_motion = np.zeros((n_sc, n_ag, n_step, 3), np.float32)
    for s in range(n_sc):
        for a in range(n_ag):
            start = int(RNG.integers(0, 4)) if a % 4 == 0 else 0
            ag_valid[s, a, start:] = True
            pos = RNG.uniform(-70, 70, 2)
            yaw = RNG.uniform(-np.pi, np.pi)
            spd = RNG.uniform(0, 15)
            for t in range(n_step):
                ag_pose[s, a, t, :2] = pos
                ag_pose[s, a, t, 2] = yaw
                ag_motion[s, a, t] = [spd, RNG.normal(0, 0.5), RNG.normal(0, 0.05)]
                yaw += RNG.normal(0, 0.03)
                spd = np.clip(spd + RNG.normal(0, 0.3), 0, 20)
                pos = pos + np.array([np.cos(yaw), np.sin(yaw)]) * spd * 0.1
    ag_valid[1, -1] = False
    return ag_valid, ag_pose, ag_motion


def gen_navi_predictor():
    """Goal- and cmd-mode NaviPredictor (navigation.py:280-322) — the heads the
    flagship's dest mode never exercises. goal runs the RNN temporal path
    (GRU + res_add + seq pooling), cmd the HPTR PointNet path, so both track
    encoders get a vs-torch golden too (VERDICT r4 missing #2)."""
    tf_cfg = DotDict(d_model=D, n_head=H, k_feedforward=4, dropout_p=0.1, bias=True,
                     activation="relu", out_layernorm=False, apply_q_rpe=False)
    n_sc, n_ag, n_step, n_mp = 2, 12, 21, 40
    ag_valid, ag_pose, ag_motion = _tracks_rand(n_sc, n_ag, n_step)
    ag_type = np.eye(3, dtype=bool)[RNG.integers(0, 3, size=(n_sc, n_ag))]
    ag_attr = np.concatenate(
        [RNG.uniform(0.5, 5.0, (n_sc, n_ag, 3)).astype(np.float32), ag_type.astype(np.float32)], -1
    )
    mp_invalid, mp_feature, mp_pose, mp_type = _mp_tokens_rand(n_sc, n_mp)
    ins = dict(ag_valid=ag_valid, ag_attr=ag_attr, ag_motion=ag_motion, ag_pose=ag_pose,
               ag_type=ag_type, mp_invalid=mp_invalid, mp_feature=mp_feature,
               mp_pose=mp_pose, mp_type=mp_type)

    for name, navi_mode, navi_dim, w in (
        ("navi_pred_goal_rnn", "goal", 4, -1),
        ("navi_pred_cmd_hptr", "cmd", 8, 11),
    ):
        torch.manual_seed(22)
        ag_enc_cfg = DotDict(
            pairwise_relative=True, temp_window_size=w, hidden_dim=D,
            input_encoder=DotDict(mode="cat", n_layer=3, mlp_dropout_p=0, mlp_use_layernorm=False),
            temp_encoder=DotDict(pooling_mode="max_valid", n_layer=3, mlp_dropout_p=0.1,
                                 mlp_use_layernorm=False, use_pointnet=True),
            pose_emb=DotDict(mode="pe_xy_yaw", theta_xy=1e3, theta_cs=1e1),
            tf_cfg=tf_cfg, ag_attr_dim=6, ag_motion_dim=3, n_tgt_knn=32, dist_limit=500.0,
            rnn_latent_temp_pool_mode="max_valid",
        )
        m = NaviPredictor(
            navi_mode=navi_mode, detach_input=True, rnn_res_add=True, n_layer_tf=2,
            n_layer_mlp=3, navi_dim=navi_dim, mlp_use_layernorm=True, k_tgt_knn=1.0,
            k_dist_limit=1000.0, ag_encoder=ag_enc_cfg, goal_log_std=2.0,
            pose_rpe=PoseEmb(pe_dim=D, mode="pe_xy_yaw", theta_xy=1e3, theta_cs=1e1),
        ).eval()
        with torch.no_grad():
            dist = m(
                ag_valid=torch.tensor(ag_valid), ag_attr=t32(ag_attr), ag_motion=t32(ag_motion),
                ag_pose=t32(ag_pose), mp_token_invalid=torch.tensor(mp_invalid),
                mp_token_feature=t32(mp_feature), mp_token_pose=t32(mp_pose),
                ag_type=torch.tensor(ag_type), mp_token_type=torch.tensor(mp_type),
            )
        outs = ({"mean": dist.mean, "std": dist.stddev} if navi_mode == "goal"
                else {"probs": dist.probs})
        save(name, m, ins, outs,
             {"navi_mode": navi_mode, "navi_dim": navi_dim, "temp_window_size": w,
              "n_layer_tf": 2, "n_layer_mlp": 3})


def gen_tl_encoder_stacked():
    """Stacked-input TL encoder variant (traffic_light.py:210-240,
    temp_stack_input=True): the 11-step window flattens into one MLP input
    instead of the temporal PointNet (VERDICT r4 missing #2). Uses a 7-step
    window to exercise the left-zero-padding path."""
    tf_cfg = DotDict(d_model=D, n_head=H, k_feedforward=4, dropout_p=0.1, bias=True,
                     activation="relu", out_layernorm=False, apply_q_rpe=False)
    n_sc, n_tl, n_mp, w, n_step = 2, 28, 40, 11, 7  # n_tl > knn_tl2tl = 24
    mp_invalid, mp_feature, mp_pose, _ = _mp_tokens_rand(n_sc, n_mp)
    tl_valid = rand_valid(n_sc, n_tl, p=0.9)
    tl_pose = np.concatenate(
        [RNG.uniform(-80, 80, (n_sc, n_tl, 2)), RNG.uniform(-np.pi, np.pi, (n_sc, n_tl, 1))], -1
    ).astype(np.float32)
    tl_attr = RNG.integers(0, n_mp, size=(n_sc, n_tl)).astype(np.int64)
    tl_state = np.eye(5, dtype=np.float32)[RNG.integers(0, 5, size=(n_sc, n_tl, n_step))]

    torch.manual_seed(23)
    m = TrafficLightEncoder(
        hidden_dim=D, tl_state_dim=5, pairwise_relative=True, tl_mode="lane",
        pose_emb=DotDict(mode="pe_xy_yaw", theta_xy=1e3, theta_cs=1e1),
        input_encoder=DotDict(mode="add", n_layer=3, mlp_dropout_p=0, mlp_use_layernorm=False),
        pose_rpe=PoseEmb(pe_dim=D, mode="pe_xy_yaw", theta_xy=1e3, theta_cs=1e1),
        temp_encoder=DotDict(pooling_mode="max_valid", n_layer=3, mlp_dropout_p=0.1,
                             mlp_use_layernorm=False, use_pointnet=True),
        temp_window_size=w, temp_stack_input=True, tf_cfg=tf_cfg,
        n_tgt_knn=32, k_tgt_knn_tl2tl=0.75, k_tgt_knn_tl2mp=0.75,
        dist_limit=500.0, k_dist_limit=0.5, n_layer_tf=2, tl_lane_detach_mp_feature=True,
    ).eval()
    with torch.no_grad():
        tl_tokens = m.pre_compute(
            tl_valid=torch.tensor(tl_valid), tl_attr=torch.tensor(tl_attr), tl_pose=t32(tl_pose),
            mp_token_invalid=torch.tensor(mp_invalid), mp_token_feature=t32(mp_feature),
            mp_token_pose=t32(mp_pose),
        )
        feat = m(tl_state=t32(tl_state), **tl_tokens)
    save("tl_encoder_stacked", m,
         {"tl_valid": tl_valid, "tl_pose": tl_pose, "tl_attr": tl_attr, "tl_state": tl_state,
          "mp_invalid": mp_invalid, "mp_feature": mp_feature, "mp_pose": mp_pose},
         {"tl_feature": feat, "tl_token_attr": tl_tokens["tl_token_attr"]},
         {"temp_window_size": w, "n_step": n_step, "n_layer_tf": 2, "temp_stack_input": True})


def gen_traffic_bots_rnn():
    """Full model in the second architecture family: TrafficBots-RNN
    (temp_window_size <= 0 — _forward_trafficbots_rollout with carried GRU
    hiddens, the flattened _forward_trafficbots_latent_encoder, the RNN TL
    encoder/predictor, and the RNN navi track encoder; VERDICT r4 missing #2).
    Rolls 11 steps so hidden-state plumbing errors compound into the outputs."""
    torch.manual_seed(44)
    cfg = flagship_cfg()
    cfg["temp_window_size"] = -1
    model = TrafficBots(
        hidden_dim=cfg.hidden_dim, mp_attr_dim=11, tl_state_dim=5, ag_attr_dim=6, ag_motion_dim=3,
        navi_mode="dest", navi_dim=None, mp_encoder=cfg.mp_encoder, tl_encoder=cfg.tl_encoder,
        tl_state_predictor=cfg.tl_state_predictor, ag_encoder=cfg.ag_encoder,
        navi_encoder=cfg.navi_encoder, navi_predictor=cfg.navi_predictor,
        latent_encoder=cfg.latent_encoder, tf_cfg=cfg.tf_cfg, time_step_gt=90, n_mp_pl_node=20,
        add_navi_latent=cfg.add_navi_latent, pose_rpe=cfg.pose_rpe,
        pairwise_relative=cfg.pairwise_relative, temp_window_size=-1,
        n_tgt_knn=cfg.n_tgt_knn, dist_limit=cfg.dist_limit, tl_mode="lane", action_dim=2,
        action_head=cfg.action_head,
    ).eval()

    sc = synth_scene()
    w = 11
    with torch.no_grad():
        mp_tokens = model.mp_encoder(
            torch.tensor(sc["mp_valid"]), t32(sc["mp_attr"]), t32(sc["mp_pose"]), torch.tensor(sc["mp_type"])
        )
        tl_tokens = model.tl_encoder.pre_compute(
            tl_valid=torch.tensor(sc["tl_valid"]), tl_attr=torch.tensor(sc["tl_attr"]),
            tl_pose=t32(sc["tl_pose"]), mp_token_invalid=mp_tokens["mp_token_invalid"],
            mp_token_feature=mp_tokens["mp_token_feature"], mp_token_pose=mp_tokens["mp_token_pose"],
        )

        model.init()
        for t in range(w):
            action_dist, tl_dist = model(
                ag_valid=torch.tensor(sc["ag_valid"][:, :, t]),
                ag_pose=t32(sc["ag_pose"][:, :, t]),
                ag_motion=t32(sc["ag_motion"][:, :, t]),
                ag_attr=t32(sc["ag_attr"]),
                ag_type=torch.tensor(sc["ag_type"]),
                ag_latent=t32(sc["ag_latent"]),
                ag_latent_valid=torch.tensor(sc["ag_valid"][:, :, 0] | True),
                ag_navi=torch.tensor(sc["ag_navi"]),
                ag_navi_valid=torch.tensor(sc["ag_navi_valid"]),
                ag_navi_updated=(t == 0),
                tl_state=t32(sc["tl_state"][:, :, t]),
                tl_tokens=tl_tokens,
                mp_tokens=mp_tokens,
            )

        navi_dist = model.navi_predictor(
            ag_valid=torch.tensor(sc["ag_valid"]), ag_attr=t32(sc["ag_attr"]),
            ag_motion=t32(sc["ag_motion"]), ag_pose=t32(sc["ag_pose"]),
            ag_type=torch.tensor(sc["ag_type"]), **mp_tokens,
        )
        latent_post = model.latent_encoder(
            ag_valid=torch.tensor(sc["ag_valid"]), ag_attr=t32(sc["ag_attr"]),
            ag_motion=t32(sc["ag_motion"]), ag_pose=t32(sc["ag_pose"]),
            ag_type=torch.tensor(sc["ag_type"]), tl_state=t32(sc["tl_state"]),
            mp_tokens=mp_tokens, tl_tokens=tl_tokens, posterior=True,
        )

    outs = {
        "action_mean": action_dist.mean,
        "action_std": action_dist.stddev,
        "tl_log_probs": torch.log_softmax(tl_dist.logits, -1),
        "rnn_hidden": model.rnn_hidden,
        "tl_rnn_hidden": model.tl_state_predictor.rnn_hidden,
        "navi_probs": navi_dist.probs,
        "latent_post_mean": latent_post.mean,
        "latent_post_std": latent_post.stddev,
    }
    save("traffic_bots_rnn", model, sc, outs,
         {"hidden": 64, "n_layer_mp": 2, "n_layer_tl": 2, "n_layer_ag": 2, "n_layer_navi": 2,
          "time_step_gt": 90, "w": w, "temp_window_size": -1})


# ----------------------------------------------------------- full model


def flagship_cfg(hidden=64, n_layer_mp=2, n_layer_tl=2, n_layer_ag=2, n_layer_navi=2):
    """The sim_agent.yaml structure at reduced width/depth (all structural
    options flagship: pairwise_relative, lane tl, dest navi, cat fusion,
    branch-type action head, diag_gaus posterior + std_gaus prior)."""
    tf_cfg = DotDict(d_model=hidden, n_head=4, k_feedforward=4, dropout_p=0.1, bias=True,
                     activation="relu", out_layernorm=False, apply_q_rpe=False)
    return DotDict(
        hidden_dim=hidden,
        pairwise_relative=True,
        temp_window_size=11,
        n_tgt_knn=32,
        dist_limit=500.0,
        tf_cfg=tf_cfg,
        pose_rpe=DotDict(mode="pe_xy_yaw", theta_xy=1e3, theta_cs=1e1),
        mp_encoder=DotDict(
            n_layer_tf=n_layer_mp,
            pose_emb=DotDict(mode="mpa_pl", theta_xy=1e3, theta_cs=1e1),
            input_encoder=DotDict(mode="cat", n_layer=3, mlp_dropout_p=0, mlp_use_layernorm=False),
            pl_encoder=DotDict(pooling_mode="max_valid", n_layer=3, mlp_dropout_p=0.1,
                               mlp_use_layernorm=False, use_pointnet=True),
        ),
        tl_encoder=DotDict(
            temp_stack_input=False, tl_lane_detach_mp_feature=True, n_layer_tf=n_layer_tl,
            k_tgt_knn_tl2tl=0.75, k_tgt_knn_tl2mp=0.75, k_dist_limit=0.5,
            pose_emb=DotDict(mode="pe_xy_yaw", theta_xy=1e3, theta_cs=1e1),
            input_encoder=DotDict(mode="add", n_layer=3, mlp_dropout_p=0, mlp_use_layernorm=False),
        ),
        tl_state_predictor=DotDict(detach_tl_feature=True, n_layer=3, rnn_dropout_p=0.1),
        ag_encoder=DotDict(
            n_layer_tf=n_layer_ag, k_tgt_knn_ag2mp=2.0, k_tgt_knn_ag2tl=0.8, k_tgt_knn_ag2ag=0.8,
            k_dist_limit=1.0, rnn_latent_temp_pool_mode="max_valid",
            pose_emb=DotDict(mode="pe_xy_yaw", theta_xy=1e3, theta_cs=1e1),
            input_encoder=DotDict(mode="cat", n_layer=3, mlp_dropout_p=0, mlp_use_layernorm=False),
        ),
        latent_encoder=DotDict(
            latent_dim=16, temporal_down_sample_rate=5, share_post_prior_encoders=False,
            latent_post=DotDict(dist_type="diag_gaus", n_cat=8, log_std=0.0,
                                mlp_use_layernorm=False, n_layer=3, branch_type=False),
            latent_prior=DotDict(dist_type="std_gaus", n_cat=8, log_std=0.0,
                                 mlp_use_layernorm=False, n_layer=3, branch_type=False),
        ),
        navi_encoder=DotDict(dest_detach_mp_feature=True),
        navi_predictor=DotDict(detach_input=True, rnn_res_add=True, n_layer_tf=n_layer_navi,
                               n_layer_mlp=3, mlp_use_layernorm=True, k_tgt_knn=1.0,
                               k_dist_limit=1000.0, goal_log_std=2.0),
        add_navi_latent=DotDict(mode="cat", res_add=True, n_layer=3,
                                mlp_use_layernorm=False, mlp_dropout_p=0.1),
        action_head=DotDict(log_std=-2.0, n_layer=3, branch_type=True, mlp_use_layernorm=False),
    )


def synth_scene(n_sc=2, n_mp=80, n_node=20, n_tl=28, n_ag=28, n_step=91, w=11):
    """Synthetic WOMD-like scene-centric batch with well-separated poses (no
    distance ties, so KNN winner SETS agree between implementations)."""
    mp_valid = np.zeros((n_sc, n_mp, n_node), bool)
    mp_pose = np.zeros((n_sc, n_mp, n_node, 3), np.float32)
    for s in range(n_sc):
        for m in range(n_mp):
            n_valid = int(RNG.integers(4, n_node + 1))
            mp_valid[s, m, :n_valid] = True
            base = RNG.uniform(-90, 90, 2)
            yaw = RNG.uniform(-np.pi, np.pi)
            step_vec = np.array([np.cos(yaw), np.sin(yaw)]) * 2.0
            for i in range(n_node):
                mp_pose[s, m, i, :2] = base + step_vec * i + RNG.normal(0, 0.05, 2)
                mp_pose[s, m, i, 2] = yaw + RNG.normal(0, 0.02)
    mp_valid[0, -2:] = False  # fully invalid polylines
    mp_type_idx = RNG.integers(0, 11, size=(n_sc, n_mp))
    mp_type = np.eye(11, dtype=bool)[mp_type_idx]
    mp_attr = mp_type.astype(np.float32)

    tl_valid = rand_valid(n_sc, n_tl, p=0.9)
    tl_pose = np.concatenate(
        [RNG.uniform(-80, 80, (n_sc, n_tl, 2)), RNG.uniform(-np.pi, np.pi, (n_sc, n_tl, 1))], -1
    ).astype(np.float32)
    tl_attr = RNG.integers(0, n_mp, size=(n_sc, n_tl)).astype(np.int64)

    ag_valid = np.zeros((n_sc, n_ag, n_step), bool)
    ag_pose = np.zeros((n_sc, n_ag, n_step, 3), np.float32)
    ag_motion = np.zeros((n_sc, n_ag, n_step, 3), np.float32)
    for s in range(n_sc):
        for a in range(n_ag):
            start = int(RNG.integers(0, 4)) if a % 5 == 0 else 0
            ag_valid[s, a, start:] = True
            pos = RNG.uniform(-70, 70, 2)
            yaw = RNG.uniform(-np.pi, np.pi)
            spd = RNG.uniform(0, 15)
            for t in range(n_step):
                ag_pose[s, a, t, :2] = pos
                ag_pose[s, a, t, 2] = yaw
                ag_motion[s, a, t] = [spd, RNG.normal(0, 0.5), RNG.normal(0, 0.05)]
                yaw += RNG.normal(0, 0.03)
                spd = np.clip(spd + RNG.normal(0, 0.3), 0, 20)
                pos = pos + np.array([np.cos(yaw), np.sin(yaw)]) * spd * 0.1
    ag_valid[1, -1] = False  # fully invalid agent
    ag_type = np.eye(3, dtype=bool)[RNG.integers(0, 3, size=(n_sc, n_ag))]
    ag_attr = np.concatenate(
        [RNG.uniform(0.5, 5.0, (n_sc, n_ag, 3)).astype(np.float32), ag_type.astype(np.float32)], -1
    )

    tl_state = np.eye(5, dtype=np.float32)[RNG.integers(0, 5, size=(n_sc, n_tl, n_step))]
    ag_navi = RNG.integers(0, n_mp, size=(n_sc, n_ag)).astype(np.int64)
    ag_navi_valid = rand_valid(n_sc, n_ag, p=0.95)
    ag_latent = rand(n_sc, n_ag, 16, scale=0.7)
    return dict(
        mp_valid=mp_valid, mp_attr=mp_attr, mp_pose=mp_pose, mp_type=mp_type,
        tl_valid=tl_valid, tl_attr=tl_attr, tl_pose=tl_pose, tl_state=tl_state,
        ag_valid=ag_valid, ag_attr=ag_attr, ag_motion=ag_motion, ag_pose=ag_pose,
        ag_type=ag_type, ag_navi=ag_navi, ag_navi_valid=ag_navi_valid, ag_latent=ag_latent,
        w=np.array(w),
    )


def gen_traffic_bots():
    torch.manual_seed(42)
    cfg = flagship_cfg()
    model = TrafficBots(
        hidden_dim=cfg.hidden_dim, mp_attr_dim=11, tl_state_dim=5, ag_attr_dim=6, ag_motion_dim=3,
        navi_mode="dest", navi_dim=None, mp_encoder=cfg.mp_encoder, tl_encoder=cfg.tl_encoder,
        tl_state_predictor=cfg.tl_state_predictor, ag_encoder=cfg.ag_encoder,
        navi_encoder=cfg.navi_encoder, navi_predictor=cfg.navi_predictor,
        latent_encoder=cfg.latent_encoder, tf_cfg=cfg.tf_cfg, time_step_gt=90, n_mp_pl_node=20,
        add_navi_latent=cfg.add_navi_latent, pose_rpe=cfg.pose_rpe,
        pairwise_relative=cfg.pairwise_relative, temp_window_size=cfg.temp_window_size,
        n_tgt_knn=cfg.n_tgt_knn, dist_limit=cfg.dist_limit, tl_mode="lane", action_dim=2,
        action_head=cfg.action_head,
    ).eval()

    sc = synth_scene()
    w = int(sc["w"])
    with torch.no_grad():
        mp_tokens = model.mp_encoder(
            torch.tensor(sc["mp_valid"]), t32(sc["mp_attr"]), t32(sc["mp_pose"]), torch.tensor(sc["mp_type"])
        )
        tl_tokens = model.tl_encoder.pre_compute(
            tl_valid=torch.tensor(sc["tl_valid"]), tl_attr=torch.tensor(sc["tl_attr"]),
            tl_pose=t32(sc["tl_pose"]), mp_token_invalid=mp_tokens["mp_token_invalid"],
            mp_token_feature=mp_tokens["mp_token_feature"], mp_token_pose=mp_tokens["mp_token_pose"],
        )

        # roll the policy over the first w steps so the history window fills
        model.init()
        for t in range(w):
            action_dist, tl_dist = model(
                ag_valid=torch.tensor(sc["ag_valid"][:, :, t]),
                ag_pose=t32(sc["ag_pose"][:, :, t]),
                ag_motion=t32(sc["ag_motion"][:, :, t]),
                ag_attr=t32(sc["ag_attr"]),
                ag_type=torch.tensor(sc["ag_type"]),
                ag_latent=t32(sc["ag_latent"]),
                ag_latent_valid=torch.tensor(sc["ag_valid"][:, :, 0] | True),
                ag_navi=torch.tensor(sc["ag_navi"]),
                ag_navi_valid=torch.tensor(sc["ag_navi_valid"]),
                ag_navi_updated=(t == 0),
                tl_state=t32(sc["tl_state"][:, :, t]),
                tl_tokens=tl_tokens,
                mp_tokens=mp_tokens,
            )

        # stage intermediates for pinpointing
        tl_feature = model.tl_encoder(tl_state=model.hist_tl_state, **tl_tokens)
        ag_feature, _ = model.ag_encoder(
            ag_valid=model.hist_ag_valid, ag_attr=t32(sc["ag_attr"]), ag_motion=model.hist_ag_motion,
            ag_pose=model.hist_ag_pose, tl_token_invalid=tl_tokens["tl_token_invalid"],
            tl_token_feature=tl_feature, tl_token_pose=tl_tokens["tl_token_pose"], rnn_hidden=None,
            **mp_tokens,
        )
        navi_feature = model.navi_encoder(
            torch.tensor(sc["ag_navi"]), t32(sc["ag_pose"][:, :, w - 1]),
            mp_tokens["mp_token_feature"], mp_tokens["mp_token_pose"],
        )

        # navi predictor + latent encoder on the full GT episode
        navi_dist = model.navi_predictor(
            ag_valid=torch.tensor(sc["ag_valid"]), ag_attr=t32(sc["ag_attr"]),
            ag_motion=t32(sc["ag_motion"]), ag_pose=t32(sc["ag_pose"]),
            ag_type=torch.tensor(sc["ag_type"]), **mp_tokens,
        )
        latent_post = model.latent_encoder(
            ag_valid=torch.tensor(sc["ag_valid"]), ag_attr=t32(sc["ag_attr"]),
            ag_motion=t32(sc["ag_motion"]), ag_pose=t32(sc["ag_pose"]),
            ag_type=torch.tensor(sc["ag_type"]), tl_state=t32(sc["tl_state"]),
            mp_tokens=mp_tokens, tl_tokens=tl_tokens, posterior=True,
        )

    outs = {
        "mp_token_feature": mp_tokens["mp_token_feature"],
        "mp_token_invalid": mp_tokens["mp_token_invalid"],
        "tl_token_attr": tl_tokens["tl_token_attr"],
        "tl_feature": tl_feature,
        "ag_feature": ag_feature,
        "navi_feature": navi_feature,
        "action_mean": action_dist.mean,
        "action_std": action_dist.stddev,
        "tl_log_probs": torch.log_softmax(tl_dist.logits, -1),
        "navi_probs": navi_dist.probs,
        "latent_post_mean": latent_post.mean,
        "latent_post_std": latent_post.stddev,
    }
    save("traffic_bots_full", model, sc, outs,
         {"hidden": 64, "n_layer_mp": 2, "n_layer_tl": 2, "n_layer_ag": 2, "n_layer_navi": 2,
          "time_step_gt": 90, "w": 11})


def main():
    print(f"torch {torch.__version__} -> {OUT}")
    torch.set_num_threads(4)
    gen_mlp()
    gen_input_encoder()
    gen_polyline_encoder()
    gen_attention()
    gen_transformer_blocks()
    gen_gru()
    gen_heads()
    gen_dist_encoder()
    gen_dist_encoder_variants()
    gen_tl_predictor()
    gen_navi_predictor()
    gen_tl_encoder_stacked()
    gen_traffic_bots()
    gen_traffic_bots_rnn()
    print("done")


if __name__ == "__main__":
    main()
