"""Golden parity vs the reference's ACTUAL torch modules.

Each golden in tests/golden/model/*.npz was produced by
scripts/gen_model_golden.py running /root/reference/src/models/... (torch CPU)
on synthetic inputs. Here the same inputs run through the flax stack with the
torch state_dict mapped via utils/torch_import.py; outputs must agree to fp32
tolerance. This is the proof layer for the whole model stack: a transposed
weight, wrong eps, or mis-wired submodule anywhere shows up as a diff.

KNN-dependent composites compare final features (attention is permutation-
invariant over KNN slots, so topk tie-order differences cancel); the synthetic
scenes use continuous random poses so winner SETS agree.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trafficbotsv15_tpu.utils import torch_import as ti

GOLD = Path(__file__).parent / "golden" / "model"
RNG = jax.random.PRNGKey(0)


def load(name):
    with np.load(GOLD / f"{name}.npz") as z:
        sd = {k[3:]: z[k] for k in z.files if k.startswith("sd/")}
        ins = {k[3:]: z[k] for k in z.files if k.startswith("in/")}
        outs = {k[4:]: z[k] for k in z.files if k.startswith("out/")}
        meta = json.loads(bytes(z["meta"]).decode()) if "meta" in z.files else {}
    return sd, ins, outs, meta


def run(module, mapped, out_struct_args, *args, method=None, **kwargs):
    """Init the flax module on the golden inputs, swap in mapped params, apply."""
    variables = module.init(RNG, *args, **kwargs) if method is None else module.init(
        RNG, *args, method=method, **kwargs
    )
    params = ti.conform(mapped, variables["params"]) if "params" in variables else {}
    if method is None:
        return module.apply({"params": params}, *args, **kwargs)
    return module.apply({"params": params}, *args, method=method, **kwargs)


def close(a, b, atol=1e-5, rtol=1e-4, name=""):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol, err_msg=name)


# ------------------------------------------------------------- primitives


def test_mlp_parity():
    from trafficbotsv15_tpu.models.mlp import MLP

    sd, ins, outs, meta = load("mlp_ln")
    m = MLP(fc_dims=meta["fc_dims"], dropout_p=meta["dropout_p"], use_layernorm=True)
    y = run(m, ti.map_mlp(sd, "", 3, use_layernorm=True, dropout_p=0.1),
            None, jnp.asarray(ins["x"]), jnp.asarray(ins["invalid"]))
    close(y, outs["y"])

    sd, ins, outs, meta = load("mlp_plain")
    m = MLP(fc_dims=meta["fc_dims"], end_layer_activation=False)
    y = run(m, ti.map_mlp(sd, "", 2, end_layer_activation=False), None, jnp.asarray(ins["x"]))
    close(y, outs["y"])


@pytest.mark.parametrize("mode", ["input", "cat", "add"])
def test_input_encoder_parity(mode):
    from trafficbotsv15_tpu.models.mlp import InputEncoder

    sd, ins, outs, meta = load(f"input_encoder_{mode}")
    m = InputEncoder(hidden_dim=64, pe_dim=meta["pe_dim"], n_layer=3, mode=mode)
    y = run(m, {"mlp": ti.map_mlp(sd, "mlp", 3, end_layer_activation=False)},
            None, jnp.asarray(ins["attr"]), jnp.asarray(ins["pe"]))
    close(y, outs["y"])


def test_polyline_encoder_parity():
    from trafficbotsv15_tpu.models.mlp import PolylineEncoder

    sd, ins, outs, meta = load("polyline_encoder")
    m = PolylineEncoder(hidden_dim=64, n_layer=3, pooling_mode="max_valid", mlp_dropout_p=0.1)
    y = run(m, ti.map_polyline_encoder(sd, "", 3, dropout_p=0.1),
            None, jnp.asarray(ins["x"]), jnp.asarray(ins["invalid"]))
    close(y, outs["y"])


ATTN_CASES = [
    ("attn_dense_self", {}),
    ("attn_dense_cross", {}),
    ("attn_knn", {}),
    ("attn_rpe", {}),
    ("attn_rpe_q", {}),
]


@pytest.mark.parametrize("name,_", ATTN_CASES)
def test_attention_parity(name, _):
    from trafficbotsv15_tpu.models.transformer import AttentionRPE

    sd, ins, outs, meta = load(name)
    m = AttentionRPE(
        d_model=meta["d_model"], n_head=meta["n_head"], dropout_p=0.1,
        d_rpe=meta.get("d_rpe", -1), apply_q_rpe=meta.get("apply_q_rpe", False),
    )
    kwargs = dict(tgt_padding_mask=jnp.asarray(ins["pad"]))
    args = [jnp.asarray(ins["src"])]
    if "tgt" in ins:
        args.append(jnp.asarray(ins["tgt"]))
    if "rpe" in ins:
        kwargs["rpe"] = jnp.asarray(ins["rpe"])
    mapped = ti.map_attention(sd, "", meta["d_model"], meta.get("apply_q_rpe", False))
    y = run(m, mapped, None, *args, **kwargs)
    close(y, outs["y"], atol=2e-5)


def test_transformer_enc_self_knn_parity():
    """Int-index KNN self-attn with rpe — both the dense-masked and the
    project-then-gather implementations must match the reference."""
    from trafficbotsv15_tpu.models.transformer import TransformerBlock

    sd, ins, outs, meta = load("tfblock_enc_self_knn")
    mapped = ti.map_transformer_block(sd, "", 64, 2, "enc_self_attn")
    for dense_max in (128, 0):
        m = TransformerBlock(d_model=64, n_head=4, n_layer=2, mode="enc_self_attn", d_rpe=40,
                             dense_knn_max=dense_max)
        y = run(
            m, mapped, None, jnp.asarray(ins["src"]),
            src_padding_mask=jnp.asarray(ins["src_pad"]),
            tgt_idx=jnp.asarray(ins["idx"], jnp.int32),
            tgt_padding_mask=jnp.asarray(ins["knn_pad"]),
            rpe=jnp.asarray(ins["rpe"]),
        )
        close(y, outs["y"], atol=5e-5, name=f"dense_knn_max={dense_max}")


def test_transformer_enc_cross_parity():
    from trafficbotsv15_tpu.models.transformer import TransformerBlock

    sd, ins, outs, _ = load("tfblock_enc_cross")
    mapped = ti.map_transformer_block(sd, "", 64, 2, "enc_cross_attn")
    m = TransformerBlock(d_model=64, n_head=4, n_layer=2, mode="enc_cross_attn", d_rpe=40)
    y = run(
        m, mapped, None, jnp.asarray(ins["src"]),
        src_padding_mask=jnp.asarray(ins["src_pad"]), tgt=jnp.asarray(ins["tgt"]),
        tgt_padding_mask=jnp.asarray(ins["tgt_pad"]), rpe=jnp.asarray(ins["rpe"]),
    )
    close(y, outs["y"], atol=5e-5)


def test_transformer_dec_cross_parity():
    from trafficbotsv15_tpu.models.transformer import TransformerBlock

    sd, ins, outs, _ = load("tfblock_dec_cross")
    mapped = ti.map_transformer_block(sd, "", 64, 2, "dec_cross_attn")
    m = TransformerBlock(d_model=64, n_head=4, n_layer=2, mode="dec_cross_attn", d_rpe=40)
    y = run(
        m, mapped, None, jnp.asarray(ins["src"]),
        src_padding_mask=jnp.asarray(ins["src_pad"]), tgt=jnp.asarray(ins["tgt"]),
        tgt_padding_mask=jnp.asarray(ins["tgt_pad"]), rpe=jnp.asarray(ins["rpe"]),
        decoder_tgt_idx=jnp.asarray(ins["dec_idx"], jnp.int32),
        decoder_tgt_padding_mask=jnp.asarray(ins["dec_pad"]),
        decoder_rpe=jnp.asarray(ins["dec_rpe"]),
    )
    close(y, outs["y"], atol=5e-5)


def test_transformer_dense_self_parity():
    from trafficbotsv15_tpu.models.transformer import TransformerBlock

    sd, ins, outs, _ = load("tfblock_dense_self")
    mapped = ti.map_transformer_block(sd, "", 64, 2, "enc_self_attn")
    m = TransformerBlock(d_model=64, n_head=4, n_layer=2, mode="enc_self_attn",
                         d_rpe=-1, out_layernorm=True)
    y = run(m, mapped, None, jnp.asarray(ins["src"]),
            src_padding_mask=jnp.asarray(ins["src_pad"]))
    close(y, outs["y"], atol=5e-5)


def test_gru_parity():
    from trafficbotsv15_tpu.models.gru import MultiAgentGRU

    sd, ins, outs, meta = load("gru_step")
    m = MultiAgentGRU(hidden_dim=64, n_layer=2, dropout_p=0.1)
    mapped = ti.map_gru(sd, "", 2, 64)
    h = jnp.asarray(ins["h"]).reshape(2, 2, 5, 64)  # torch [n_layer, n_sc*n_ag, d]
    y, h1 = run(m, mapped, None, jnp.asarray(ins["x"]), jnp.asarray(ins["invalid"]), h)
    close(y, outs["y"])
    close(h1.reshape(2, 10, 64), outs["h1"], name="hidden")

    sd, ins, outs, _ = load("gru_seq")
    y, _ = run(m, ti.map_gru(sd, "", 2, 64), None,
               jnp.asarray(ins["x"]), jnp.asarray(ins["invalid"]))
    close(y, outs["y"])


def test_action_head_parity():
    from trafficbotsv15_tpu.config import ActionHeadCfg
    from trafficbotsv15_tpu.models.heads import ActionHead

    sd, ins, outs, meta = load("action_head_branch")
    m = ActionHead(cfg=ActionHeadCfg(log_std=-2.0, n_layer=3, branch_type=True),
                   hidden_dim=64, action_dim=2)
    dist = run(m, ti.map_action_head(sd, "", 3, True, False, True), None,
               jnp.asarray(ins["x"]), jnp.asarray(ins["valid"]), jnp.asarray(ins["ag_type"]))
    close(dist.mean, outs["mean"])
    close(dist.std, outs["std"])

    sd, ins, outs, meta = load("action_head_mlp_std")
    m = ActionHead(cfg=ActionHeadCfg(log_std=None, n_layer=3, branch_type=False,
                                     mlp_use_layernorm=True), hidden_dim=64, action_dim=2)
    dist = run(m, ti.map_action_head(sd, "", 3, False, True, False), None,
               jnp.asarray(ins["x"]), jnp.asarray(ins["valid"]), jnp.asarray(ins["ag_type"]))
    close(dist.mean, outs["mean"])
    close(dist.std, outs["std"])


@pytest.mark.parametrize("mode", ["cat", "add", "mul"])
def test_add_navi_latent_parity(mode):
    from trafficbotsv15_tpu.config import AddNaviLatentCfg
    from trafficbotsv15_tpu.models.heads import AddNaviLatent

    sd, ins, outs, meta = load(f"add_navi_{mode}")
    m = AddNaviLatent(
        cfg=AddNaviLatentCfg(mode=mode, res_add=meta["res_add"], n_layer=2, mlp_dropout_p=0.1),
        hidden_dim=64,
    )
    y = run(m, ti.map_add_navi_latent(sd, "", 2, False, 0.1), None,
            jnp.asarray(ins["x"]), jnp.asarray(ins["z"]), jnp.asarray(ins["z_valid"]))
    close(y, outs["y"])


def test_dist_encoder_parity():
    from trafficbotsv15_tpu.config import DistEncoderCfg
    from trafficbotsv15_tpu.models.latent_encoder import DistEncoder

    sd, ins, outs, _ = load("dist_enc_diag_gaus")
    m = DistEncoder(cfg=DistEncoderCfg(dist_type="diag_gaus", log_std=0.0, n_layer=3),
                    hidden_dim=64, out_dim=16)
    dist = run(m, ti.map_dist_encoder(sd, "", "diag_gaus", 3, False, False, True), None,
               jnp.asarray(ins["x"]), jnp.asarray(ins["valid"]), jnp.asarray(ins["ag_type"]))
    close(dist.mean, outs["mean"])
    close(dist.std, outs["std"])

    sd, ins, outs, _ = load("dist_enc_cat_branch")
    m = DistEncoder(cfg=DistEncoderCfg(dist_type="cat", branch_type=True, n_cat=8,
                                       log_std=None, n_layer=3), hidden_dim=64, out_dim=16)
    dist = run(m, ti.map_dist_encoder(sd, "", "cat", 3, True, False, False), None,
               jnp.asarray(ins["x"]), jnp.asarray(ins["valid"]), jnp.asarray(ins["ag_type"]))
    close(dist.logits, outs["logits"])


def test_tl_predictor_parity():
    from trafficbotsv15_tpu.config import TlStatePredictorCfg
    from trafficbotsv15_tpu.models.traffic_light import TrafficLightStatePredictor

    sd, ins, outs, _ = load("tl_predictor_hptr")
    m = TrafficLightStatePredictor(cfg=TlStatePredictorCfg(n_layer=3), hidden_dim=64,
                                   tl_state_dim=5, temp_window_size=11)
    logits, _ = run(m, ti.map_tl_predictor(sd, "", 3, 64, 11), None,
                    jnp.asarray(ins["x"]), jnp.asarray(ins["invalid"]))
    close(logits, outs["y"])


def test_dist_encoder_variant_parity():
    """Plain-cat, parameter-free std_cat (incl. MultiCategorical.log_prob), and
    branched diag_gaus with MLP log-std (latent_encoder.py:125-253)."""
    from trafficbotsv15_tpu.config import DistEncoderCfg
    from trafficbotsv15_tpu.models.latent_encoder import DistEncoder

    sd, ins, outs, _ = load("dist_enc_cat_plain")
    m = DistEncoder(cfg=DistEncoderCfg(dist_type="cat", branch_type=False, n_cat=8,
                                       log_std=None, n_layer=3), hidden_dim=64, out_dim=16)
    dist = run(m, ti.map_dist_encoder(sd, "", "cat", 3, False, False, False), None,
               jnp.asarray(ins["x"]), jnp.asarray(ins["valid"]), jnp.asarray(ins["ag_type"]))
    close(dist.logits, outs["logits"])

    _, ins, outs, _ = load("dist_enc_std_cat")
    m = DistEncoder(cfg=DistEncoderCfg(dist_type="std_cat", n_cat=8), hidden_dim=64, out_dim=16)
    dist = run(m, {}, None,
               jnp.asarray(ins["x"]), jnp.asarray(ins["valid"]), jnp.asarray(ins["ag_type"]))
    close(dist.logits, outs["logits"], name="std_cat logits")
    close(dist.log_prob(jnp.asarray(ins["sample"])), outs["log_prob"], name="std_cat log_prob")

    sd, ins, outs, _ = load("dist_enc_diag_gaus_branch")
    m = DistEncoder(cfg=DistEncoderCfg(dist_type="diag_gaus", branch_type=True,
                                       log_std=None, n_layer=3), hidden_dim=64, out_dim=16)
    dist = run(m, ti.map_dist_encoder(sd, "", "diag_gaus", 3, True, False, False), None,
               jnp.asarray(ins["x"]), jnp.asarray(ins["valid"]), jnp.asarray(ins["ag_type"]))
    close(dist.mean, outs["mean"], name="branch mean")
    close(dist.std, outs["std"], atol=2e-5, rtol=1e-3, name="branch std")


@pytest.mark.slow  # torch-side goal/cmd heads compile two full track encoders
@pytest.mark.parametrize("name,navi_mode,w", [
    ("navi_pred_goal_rnn", "goal", -1),
    ("navi_pred_cmd_hptr", "cmd", 11),
])
def test_navi_predictor_goal_cmd_parity(name, navi_mode, w):
    """Goal/cmd NaviPredictor heads + both track encoders (navigation.py:280-322):
    goal exercises the RNN temporal path (GRU + res_add + pooling), cmd the
    HPTR PointNet path."""
    from trafficbotsv15_tpu.config import (
        AgEncoderCfg, NaviPredictorCfg, PolylineEncoderCfg, TransformerCfg,
    )
    from trafficbotsv15_tpu.models.navigation import NaviPredictor
    from trafficbotsv15_tpu.models.tokens import MapTokens
    from trafficbotsv15_tpu.ops.pose_emb import PoseEmbConfig

    sd, ins, outs, meta = load(name)
    cfg = NaviPredictorCfg(n_layer_tf=2, n_layer_mlp=3)
    m = NaviPredictor(
        cfg=cfg, ag_encoder_cfg=AgEncoderCfg(), tf_cfg=TransformerCfg(d_model=64),
        hidden_dim=64, navi_mode=navi_mode, navi_dim=meta["navi_dim"],
        pairwise_relative=True, temp_window_size=w, n_tgt_knn=32, dist_limit=500.0,
        pose_rpe=PoseEmbConfig(mode="pe_xy_yaw", pe_dim=64, theta_xy=1e3, theta_cs=1e1),
    )
    mp_tokens = MapTokens(
        invalid=jnp.asarray(ins["mp_invalid"]), feature=jnp.asarray(ins["mp_feature"]),
        pose=jnp.asarray(ins["mp_pose"]), type=jnp.asarray(ins["mp_type"]),
    )
    mapped = ti.map_navi_predictor(sd, "", cfg, AgEncoderCfg(), 64, w,
                                   PolylineEncoderCfg(), 64, navi_mode)
    dist = run(
        m, mapped, None,
        jnp.asarray(ins["ag_valid"]), jnp.asarray(ins["ag_attr"]), jnp.asarray(ins["ag_motion"]),
        jnp.asarray(ins["ag_pose"]), jnp.asarray(ins["ag_type"]), mp_tokens,
    )
    if navi_mode == "goal":
        close(dist.mean, outs["mean"], atol=2e-4, rtol=1e-3, name="goal mean")
        close(dist.std, outs["std"], atol=2e-5, rtol=1e-4, name="goal std")
    else:
        close(dist.probs, outs["probs"], atol=1e-5, rtol=1e-3, name="cmd probs")


@pytest.mark.slow
def test_tl_encoder_stacked_parity():
    """Stacked-input TL encoder (traffic_light.py:210-240, temp_stack_input=True)
    with a 7-step window (left-zero-padding path)."""
    from trafficbotsv15_tpu.config import PolylineEncoderCfg, TlEncoderCfg, TransformerCfg
    from trafficbotsv15_tpu.models.tokens import MapTokens
    from trafficbotsv15_tpu.models.traffic_light import TrafficLightEncoder
    from trafficbotsv15_tpu.ops.pose_emb import PoseEmbConfig

    sd, ins, outs, meta = load("tl_encoder_stacked")
    cfg = TlEncoderCfg(temp_stack_input=True, n_layer_tf=2)
    m = TrafficLightEncoder(
        cfg=cfg, tf_cfg=TransformerCfg(d_model=64), hidden_dim=64, tl_state_dim=5,
        tl_mode="lane", pairwise_relative=True, temp_window_size=meta["temp_window_size"],
        n_tgt_knn=32, dist_limit=500.0,
        pose_rpe=PoseEmbConfig(mode="pe_xy_yaw", pe_dim=64, theta_xy=1e3, theta_cs=1e1),
    )
    mp_tokens = MapTokens(
        invalid=jnp.asarray(ins["mp_invalid"]), feature=jnp.asarray(ins["mp_feature"]),
        pose=jnp.asarray(ins["mp_pose"]),
        type=jnp.ones(ins["mp_invalid"].shape + (11,), bool),
    )
    tl_valid = jnp.asarray(ins["tl_valid"])
    tl_attr = jnp.asarray(ins["tl_attr"], jnp.int32)
    tl_pose = jnp.asarray(ins["tl_pose"])
    tl_state = jnp.asarray(ins["tl_state"])

    def fwd(mdl):
        toks = mdl.precompute(tl_valid, tl_attr, tl_pose, mp_tokens)
        return mdl(tl_state, toks), toks.attr

    variables = m.init(RNG, method=fwd)
    mapped = ti.map_tl_encoder(sd, "", cfg, 64, meta["temp_window_size"], PolylineEncoderCfg())
    params = ti.conform(mapped, variables["params"])
    feat, attr = m.apply({"params": params}, method=fwd)
    close(attr, outs["tl_token_attr"], name="tl_attr")
    close(feat, outs["tl_feature"], atol=5e-5, rtol=1e-3, name="tl_feature")


# ------------------------------------------------------------ full model


@pytest.fixture(scope="module")
def full_model():
    from trafficbotsv15_tpu.config import (
        ActionHeadCfg, AddNaviLatentCfg, AgEncoderCfg, DistEncoderCfg, LatentEncoderCfg,
        MapEncoderCfg, ModelCfg, NaviEncoderCfg, NaviPredictorCfg, PoseEmbCfg,
        TlEncoderCfg, TlStatePredictorCfg, TransformerCfg,
    )
    from trafficbotsv15_tpu.models.traffic_bots import TrafficBots

    sd, ins, outs, meta = load("traffic_bots_full")
    cfg = ModelCfg(
        hidden_dim=64,
        tf_cfg=TransformerCfg(d_model=64),
        mp_encoder=MapEncoderCfg(n_layer_tf=meta["n_layer_mp"]),
        tl_encoder=TlEncoderCfg(n_layer_tf=meta["n_layer_tl"]),
        ag_encoder=AgEncoderCfg(n_layer_tf=meta["n_layer_ag"]),
        navi_predictor=NaviPredictorCfg(n_layer_tf=meta["n_layer_navi"]),
    )
    model = TrafficBots(cfg=cfg, time_step_gt=meta["time_step_gt"])
    mapped = ti.map_traffic_bots(sd, cfg, meta["time_step_gt"])
    return model, mapped, ins, outs, meta


def _full_variables(model, mapped, ins, meta):
    """Init the full param structure by tracing every phase once, then map."""
    import jax.numpy as jnp

    w = int(meta["w"])
    a = {k: jnp.asarray(v) for k, v in ins.items() if k != "w"}

    def init_all(mdl):
        mp = mdl.encode_map(a["mp_valid"], a["mp_attr"], a["mp_pose"], a["mp_type"])
        tl = mdl.precompute_tl(a["tl_valid"], a["tl_attr"], a["tl_pose"], mp)
        mdl.encode_latent(a["ag_valid"], a["ag_attr"], a["ag_motion"], a["ag_pose"],
                          a["ag_type"], a["tl_state"], mp, tl, posterior=True)
        mdl.predict_navi(a["ag_valid"], a["ag_attr"], a["ag_motion"], a["ag_pose"], a["ag_type"], mp)
        return mdl.step(
            a["ag_valid"][:, :, w - 1], a["ag_valid"][:, :, :w], a["ag_pose"][:, :, :w],
            a["ag_motion"][:, :, :w], a["tl_state"][:, :, :w], jnp.zeros((w,), bool),
            a["ag_attr"], a["ag_type"], a["ag_latent"], jnp.ones(a["ag_navi"].shape, bool),
            a["ag_navi"], a["ag_navi_valid"], tl, mp,
        )

    variables = model.init(RNG, method=init_all)
    params = ti.conform(mapped, variables["params"])
    return {"params": params}, a, w


@pytest.mark.slow
def test_traffic_bots_full_parity(full_model):
    """One policy step with the reference's weights: every stage must agree."""
    model, mapped, ins, outs, meta = full_model
    variables, a, w = _full_variables(model, mapped, ins, meta)

    mp = model.apply(variables, a["mp_valid"], a["mp_attr"], a["mp_pose"], a["mp_type"],
                     method="encode_map")
    close(mp.invalid, outs["mp_token_invalid"], name="mp_invalid")
    close(mp.feature, outs["mp_token_feature"], atol=2e-4, rtol=1e-3, name="mp_feature")

    tl = model.apply(variables, a["tl_valid"], a["tl_attr"], a["tl_pose"], mp,
                     method="precompute_tl")
    close(tl.attr, outs["tl_token_attr"], atol=2e-4, rtol=1e-3, name="tl_attr")

    action_dist, tl_logits, _, _ = model.apply(
        variables,
        a["ag_valid"][:, :, w - 1], a["ag_valid"][:, :, :w], a["ag_pose"][:, :, :w],
        a["ag_motion"][:, :, :w], a["tl_state"][:, :, :w], jnp.zeros((w,), bool),
        a["ag_attr"], a["ag_type"], a["ag_latent"], jnp.ones(a["ag_navi"].shape, bool),
        a["ag_navi"], a["ag_navi_valid"], tl, mp,
        method="step",
    )
    close(action_dist.mean, outs["action_mean"], atol=5e-4, rtol=1e-3, name="action_mean")
    close(action_dist.std, outs["action_std"], atol=5e-4, rtol=1e-3, name="action_std")
    close(jax.nn.log_softmax(tl_logits, -1), outs["tl_log_probs"], atol=5e-4, rtol=1e-3,
          name="tl_log_probs")


@pytest.fixture(scope="module")
def rnn_model():
    from trafficbotsv15_tpu.config import (
        AgEncoderCfg, MapEncoderCfg, ModelCfg, NaviPredictorCfg, TlEncoderCfg, TransformerCfg,
    )
    from trafficbotsv15_tpu.models.traffic_bots import TrafficBots

    sd, ins, outs, meta = load("traffic_bots_rnn")
    cfg = ModelCfg(
        hidden_dim=64,
        temp_window_size=-1,
        tf_cfg=TransformerCfg(d_model=64),
        mp_encoder=MapEncoderCfg(n_layer_tf=meta["n_layer_mp"]),
        tl_encoder=TlEncoderCfg(n_layer_tf=meta["n_layer_tl"]),
        ag_encoder=AgEncoderCfg(n_layer_tf=meta["n_layer_ag"]),
        navi_predictor=NaviPredictorCfg(n_layer_tf=meta["n_layer_navi"]),
    )
    model = TrafficBots(cfg=cfg, time_step_gt=meta["time_step_gt"])
    mapped = ti.map_traffic_bots(sd, cfg, meta["time_step_gt"])
    return model, mapped, ins, outs, meta


def _rnn_variables(model, mapped, ins):
    a = {k: jnp.asarray(v) for k, v in ins.items() if k != "w"}

    def init_all(mdl):
        mp = mdl.encode_map(a["mp_valid"], a["mp_attr"], a["mp_pose"], a["mp_type"])
        tl = mdl.precompute_tl(a["tl_valid"], a["tl_attr"], a["tl_pose"], mp)
        mdl.encode_latent(a["ag_valid"], a["ag_attr"], a["ag_motion"], a["ag_pose"],
                          a["ag_type"], a["tl_state"], mp, tl, posterior=True)
        mdl.predict_navi(a["ag_valid"], a["ag_attr"], a["ag_motion"], a["ag_pose"], a["ag_type"], mp)
        return mdl.step(
            a["ag_valid"][:, :, 0], a["ag_valid"][:, :, 0:1], a["ag_pose"][:, :, 0:1],
            a["ag_motion"][:, :, 0:1], a["tl_state"][:, :, 0:1], jnp.zeros((1,), bool),
            a["ag_attr"], a["ag_type"], a["ag_latent"], jnp.ones(a["ag_navi"].shape, bool),
            a["ag_navi"], a["ag_navi_valid"], tl, mp,
        )

    variables = model.init(RNG, method=init_all)
    params = ti.conform(mapped, variables["params"])
    return {"params": params}, a


@pytest.mark.slow
def test_traffic_bots_rnn_parity(rnn_model):
    """The second architecture family end-to-end: _forward_trafficbots_rollout
    (3 attention stages + carried GRU hidden) driven for 11 steps, the RNN TL
    encoder + GRU state predictor, with the reference's actual weights
    (agent_encoder.py:180-249, traffic_light.py:241-287)."""
    model, mapped, ins, outs, meta = rnn_model
    variables, a = _rnn_variables(model, mapped, ins)

    mp = model.apply(variables, a["mp_valid"], a["mp_attr"], a["mp_pose"], a["mp_type"],
                     method="encode_map")
    tl = model.apply(variables, a["tl_valid"], a["tl_attr"], a["tl_pose"], mp,
                     method="precompute_tl")

    rnn_h = tl_h = None
    for t in range(int(meta["w"])):
        action_dist, tl_logits, rnn_h, tl_h = model.apply(
            variables,
            a["ag_valid"][:, :, t], a["ag_valid"][:, :, t:t + 1], a["ag_pose"][:, :, t:t + 1],
            a["ag_motion"][:, :, t:t + 1], a["tl_state"][:, :, t:t + 1], jnp.zeros((1,), bool),
            a["ag_attr"], a["ag_type"], a["ag_latent"], jnp.ones(a["ag_navi"].shape, bool),
            a["ag_navi"], a["ag_navi_valid"], tl, mp,
            rnn_hidden=rnn_h, tl_rnn_hidden=tl_h,
            method="step",
        )

    close(action_dist.mean, outs["action_mean"], atol=5e-4, rtol=1e-3, name="action_mean")
    close(action_dist.std, outs["action_std"], atol=5e-4, rtol=1e-3, name="action_std")
    close(jax.nn.log_softmax(tl_logits, -1), outs["tl_log_probs"], atol=5e-4, rtol=1e-3,
          name="tl_log_probs")
    # torch hidden layout: [n_layer, n_sc*n_ag, d]
    n_layer = outs["rnn_hidden"].shape[0]
    close(rnn_h.reshape(n_layer, -1, rnn_h.shape[-1]), outs["rnn_hidden"],
          atol=5e-4, rtol=1e-3, name="rnn_hidden")
    close(tl_h.reshape(n_layer, -1, tl_h.shape[-1]), outs["tl_rnn_hidden"],
          atol=5e-4, rtol=1e-3, name="tl_rnn_hidden")


@pytest.mark.slow
def test_traffic_bots_rnn_navi_latent_parity(rnn_model):
    """RNN-mode NaviPredictor (GRU track encoder) and the flattened
    _forward_trafficbots_latent_encoder posterior (agent_encoder.py:251-319)."""
    model, mapped, ins, outs, meta = rnn_model
    variables, a = _rnn_variables(model, mapped, ins)

    mp = model.apply(variables, a["mp_valid"], a["mp_attr"], a["mp_pose"], a["mp_type"],
                     method="encode_map")
    tl = model.apply(variables, a["tl_valid"], a["tl_attr"], a["tl_pose"], mp,
                     method="precompute_tl")

    navi_dist = model.apply(
        variables, a["ag_valid"], a["ag_attr"], a["ag_motion"], a["ag_pose"], a["ag_type"], mp,
        method="predict_navi",
    )
    close(navi_dist.probs, outs["navi_probs"], atol=1e-4, rtol=1e-3, name="navi_probs")

    latent_post = model.apply(
        variables, a["ag_valid"], a["ag_attr"], a["ag_motion"], a["ag_pose"], a["ag_type"],
        a["tl_state"], mp, tl, True,
        method="encode_latent",
    )
    close(latent_post.mean, outs["latent_post_mean"], atol=5e-4, rtol=1e-3, name="latent_mean")
    close(latent_post.std, outs["latent_post_std"], atol=5e-4, rtol=1e-3, name="latent_std")


@pytest.mark.slow
def test_traffic_bots_navi_latent_parity(full_model):
    model, mapped, ins, outs, meta = full_model
    variables, a, w = _full_variables(model, mapped, ins, meta)

    mp = model.apply(variables, a["mp_valid"], a["mp_attr"], a["mp_pose"], a["mp_type"],
                     method="encode_map")
    tl = model.apply(variables, a["tl_valid"], a["tl_attr"], a["tl_pose"], mp,
                     method="precompute_tl")

    navi_dist = model.apply(
        variables, a["ag_valid"], a["ag_attr"], a["ag_motion"], a["ag_pose"], a["ag_type"], mp,
        method="predict_navi",
    )
    close(navi_dist.probs, outs["navi_probs"], atol=1e-4, rtol=1e-3, name="navi_probs")

    latent_post = model.apply(
        variables, a["ag_valid"], a["ag_attr"], a["ag_motion"], a["ag_pose"], a["ag_type"],
        a["tl_state"], mp, tl, True,
        method="encode_latent",
    )
    close(latent_post.mean, outs["latent_post_mean"], atol=5e-4, rtol=1e-3, name="latent_mean")
    close(latent_post.std, outs["latent_post_std"], atol=5e-4, rtol=1e-3, name="latent_std")
