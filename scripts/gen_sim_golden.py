#!/usr/bin/env python
"""Generate SIM-level parity goldens from the reference's ACTUAL torch code.

Runs /root/reference/src/utils/{wosac_collision,rewards,traffic_rule_checker,
pose_emb}.py (plain torch, CPU) on synthetic scenes and saves
(inputs, outputs) npz files under tests/golden/sim/. tests/test_sim_parity.py
replays each case through the jax stack and asserts numeric parity — the same
offline-golden pattern as scripts/gen_model_golden.py (model modules) and
scripts/gen_etl_golden.py (ETL).

These close the last vs-reference gap below the model layer: until now the
collision / reward / rule-checker / pose-embedding code had only
internal-consistency tests (e.g. SoA-vs-AoS), so a sign flip replicated on
both sides of a refactor would have been invisible.

Cases:
  pose_emb_{xy_dir,mpa_pl,pe_xy_dir,pe_xy_yaw}  x  {yaw, dir} input forms
      (src/utils/pose_emb.py:7-89)
  wosac_collision — bbox corners + signed pairwise distances + collided mask
      on a scene engineered to contain overlaps (src/utils/wosac_collision.py)
  diffbar_reward_{il,coll_max,coll_mean} — the flagship IL reward and both
      5-circle collision reductions (src/utils/rewards.py:35-154)
  rule_checker — a 30-step scripted scenario driving all 8 checks through the
      stateful reference TrafficRuleChecker; every *_this_step / accumulated
      key recorded per step (src/utils/traffic_rule_checker.py:342-451)

Usage: python scripts/gen_sim_golden.py
"""

from __future__ import annotations

import json
import sys
import types
from pathlib import Path

import numpy as np
import torch


class DotDict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v


_om = types.ModuleType("omegaconf")
_om.DictConfig = DotDict
_om.ListConfig = list
sys.modules.setdefault("omegaconf", _om)
sys.modules.setdefault("transforms3d", types.ModuleType("transforms3d"))
sys.path.insert(0, "/root/reference/src")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root (synthetic batch gen)

from data_modules.womd_post_processing import WOMDPostProcessing  # noqa: E402
from utils.pose_emb import PoseEmb  # noqa: E402
from utils.rewards import DifferentiableReward  # noqa: E402
from utils.traffic_rule_checker import TrafficRuleChecker  # noqa: E402
from utils.wosac_collision import (  # noqa: E402
    _minkowski_sum_of_box_and_box_points,
    _signed_distance_from_point_to_convex_polygon,
    check_collided_wosac,
    get_ag_bbox,
)

OUT = Path(__file__).resolve().parents[1] / "tests" / "golden" / "sim"
RNG = np.random.default_rng(20260820)


def _np(x):
    if isinstance(x, torch.Tensor):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def save(name, inputs, outputs, meta=None):
    arrs = {}
    for k, v in inputs.items():
        if v is not None:
            arrs[f"in/{k}"] = _np(v)
    for k, v in outputs.items():
        if v is not None:
            arrs[f"out/{k}"] = _np(v)
    arrs["meta"] = np.frombuffer(json.dumps(meta or {}).encode(), dtype=np.uint8)
    OUT.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT / f"{name}.npz", **arrs)
    print(f"  {name}: {len(arrs)} arrays")


def t32(a):
    return torch.tensor(np.asarray(a, np.float32))


# ---------------------------------------------------------------- pose emb


def gen_pose_emb():
    xy = (RNG.standard_normal((3, 5, 2)) * 20).astype(np.float32)
    yaw = (RNG.uniform(-np.pi, np.pi, (3, 5, 1))).astype(np.float32)
    dvec = np.concatenate([np.cos(yaw), np.sin(yaw)], -1)
    # mpa_pl consumes (segment start, segment vec) — small magnitudes
    seg_start = (RNG.standard_normal((3, 5, 2)) * 4).astype(np.float32)
    seg_vec = (RNG.standard_normal((3, 5, 2)) * 2).astype(np.float32)
    for mode in ["xy_dir", "mpa_pl", "pe_xy_dir", "pe_xy_yaw"]:
        m = PoseEmb(mode=mode, pe_dim=64, theta_xy=1e3, theta_cs=1e1).eval()
        if mode == "mpa_pl":
            out_yaw = m(t32(seg_start), t32(yaw))
            out_dir = m(t32(seg_start), t32(seg_vec))
            save(f"pose_emb_{mode}",
                 dict(xy=seg_start, yaw=yaw, dvec=seg_vec),
                 dict(out_yaw=out_yaw, out_dir=out_dir), dict(mode=mode, pe_dim=64))
        else:
            out_yaw = m(t32(xy), t32(yaw))
            out_dir = m(t32(xy), t32(dvec))
            save(f"pose_emb_{mode}",
                 dict(xy=xy, yaw=yaw, dvec=dvec),
                 dict(out_yaw=out_yaw, out_dir=out_dir), dict(mode=mode, pe_dim=64))


# ---------------------------------------------------------- wosac collision


def gen_wosac_collision():
    n_sc, n_ag = 3, 8
    # cluster positions in a 25 m box so several pairs genuinely overlap
    pose = np.zeros((n_sc, n_ag, 3), np.float32)
    pose[..., :2] = RNG.uniform(-12, 12, (n_sc, n_ag, 2))
    pose[..., 2] = RNG.uniform(-np.pi, np.pi, (n_sc, n_ag))
    # force two exact near-overlaps per scene
    pose[:, 1, :2] = pose[:, 0, :2] + np.float32([1.0, 0.3])
    pose[:, 3, :2] = pose[:, 2, :2] + np.float32([0.2, 2.0])
    size = np.zeros((n_sc, n_ag, 3), np.float32)
    size[..., 0] = RNG.uniform(3.5, 6.0, (n_sc, n_ag))  # length
    size[..., 1] = RNG.uniform(1.6, 2.4, (n_sc, n_ag))  # width
    size[..., 2] = 1.8
    valid = RNG.random((n_sc, n_ag)) < 0.85
    valid[:, :4] = True

    pose_t, size_t, valid_t = t32(pose), t32(size), torch.tensor(valid)
    bbox = get_ag_bbox(pose_t, size_t[..., :2])
    collided = check_collided_wosac(pose_t, size_t, valid_t)
    # signed pairwise distances straight from the reference internals (the
    # strictest float-level comparison, before the boolean threshold)
    shrink = torch.min(size_t[:, :, 0], size_t[:, :, 1]) * 0.7 / 2.0
    corners = get_ag_bbox(pose_t, size_t[:, :, :2] - 2.0 * shrink.unsqueeze(-1))
    ev = corners.unsqueeze(2).expand(-1, -1, n_ag, -1, -1).flatten(1, 2)
    al = corners.unsqueeze(1).expand(-1, n_ag, -1, -1, -1).flatten(1, 2)
    mink = _minkowski_sum_of_box_and_box_points(ev, -1.0 * al)
    sd = _signed_distance_from_point_to_convex_polygon(
        torch.zeros_like(mink[:, :, 0, :]), mink).view(n_sc, n_ag, n_ag)
    sd = sd - shrink.unsqueeze(1) - shrink.unsqueeze(2)
    save("wosac_collision",
         dict(pose=pose, size=size, valid=valid),
         dict(bbox=bbox, signed_dist=sd, collided=collided))


# ---------------------------------------------------------------- rewards


def _reward_cfgs():
    l_pos = DotDict(weight=1e-1, criterion="SmoothL1Loss")
    l_rot = DotDict(weight=1e1, criterion="SmoothL1Loss", angular_type="cosine")
    l_spd = DotDict(weight=1e-1, criterion="SmoothL1Loss")
    return l_pos, l_rot, l_spd


def gen_rewards():
    n_sc, n_ag = 3, 10
    pred_valid = RNG.random((n_sc, n_ag)) < 0.85
    gt_valid = RNG.random((n_sc, n_ag)) < 0.85
    pred_pose = np.zeros((n_sc, n_ag, 3), np.float32)
    pred_pose[..., :2] = RNG.uniform(-15, 15, (n_sc, n_ag, 2))
    pred_pose[..., 2] = RNG.uniform(-np.pi, np.pi, (n_sc, n_ag))
    gt_pose = pred_pose + (RNG.standard_normal((n_sc, n_ag, 3)) * [2.0, 2.0, 0.7]).astype(np.float32)
    pred_motion = (RNG.standard_normal((n_sc, n_ag, 3)) * 3).astype(np.float32)
    gt_motion = pred_motion + (RNG.standard_normal((n_sc, n_ag, 3)) * 1.5).astype(np.float32)
    size = np.zeros((n_sc, n_ag, 3), np.float32)
    size[..., 0] = RNG.uniform(3.5, 6.0, (n_sc, n_ag))
    size[..., 1] = RNG.uniform(1.6, 2.4, (n_sc, n_ag))
    # overlap a pair so the 5-circle penalty is non-trivially nonzero
    pred_pose[:, 1, :2] = pred_pose[:, 0, :2] + np.float32([0.8, 0.2])

    l_pos, l_rot, l_spd = _reward_cfgs()
    ins = dict(pred_valid=pred_valid, pred_pose=pred_pose, pred_motion=pred_motion,
               gt_valid=gt_valid, gt_pose=gt_pose, gt_motion=gt_motion, size=size)
    args = [torch.tensor(pred_valid), t32(pred_pose), t32(pred_motion),
            torch.tensor(gt_valid), t32(gt_pose), t32(gt_motion), t32(size)]

    for name, w_coll, red_max in [("il", 0.0, True), ("coll_max", 1.0, True),
                                  ("coll_mean", 1.0, False)]:
        r = DifferentiableReward(l_pos, l_rot, l_spd, w_collision=w_coll,
                                 use_il_loss=True, reduce_collsion_with_max=red_max,
                                 is_enabled=True)
        out = r.get(*args)
        save(f"diffbar_reward_{name}", ins, out,
             dict(w_collision=w_coll, reduce_max=red_max))


# ------------------------------------------------------------ rule checker


def _build_scene():
    """Two scenes: scene 0 scripted to fire every check, scene 1 random."""
    n_sc, n_ag, n_mp, n_node, n_tl, n_type = 2, 8, 24, 20, 6, 11
    mp_valid = np.zeros((n_sc, n_mp, n_node), bool)
    mp_type = np.zeros((n_sc, n_mp, n_type), bool)
    mp_pos = np.zeros((n_sc, n_mp, n_node, 2), np.float32)
    mp_dir = np.zeros((n_sc, n_mp, n_node, 2), np.float32)
    for s in range(n_sc):
        for p in range(n_mp):
            n_val = int(RNG.integers(8, n_node + 1))
            mp_valid[s, p, :n_val] = True
            ty = [0, 1, 2, 4, 5, 7, 15 % 11, 9, 10][p % 9]
            mp_type[s, p, ty] = True
            start = RNG.uniform(-40, 40, 2)
            heading = RNG.uniform(-np.pi, np.pi)
            step = np.float32([np.cos(heading), np.sin(heading)]) * 2.0
            pts = start[None] + np.arange(n_node)[:, None] * step[None]
            mp_pos[s, p] = pts
            mp_dir[s, p] = step[None]
    # scene 0: polyline 0 = straight lane along +x through origin (lane center
    # for the passive check); polyline 3 = road edge crossing x=20
    mp_pos[0, 0] = np.stack([np.arange(n_node) * 2.0 - 20.0, np.zeros(n_node)], -1)
    mp_dir[0, 0] = np.float32([2.0, 0.0])[None]
    mp_type[0, 0] = False
    mp_type[0, 0, 1] = True  # lane
    mp_pos[0, 3] = np.stack([np.full(n_node, 20.0), np.arange(n_node) * 2.0 - 20.0], -1)
    mp_dir[0, 3] = np.float32([0.0, 2.0])[None]
    mp_type[0, 3] = False
    mp_type[0, 3, 4] = True  # road edge
    mp_valid[0, 0] = mp_valid[0, 3] = True

    mp_boundary = np.tile(np.float32([-50, 50, -50, 50]), (n_sc, 1))

    ag_type = np.zeros((n_sc, n_ag, 3), bool)
    ag_type[:, :6, 0] = True  # vehicles
    ag_type[:, 6, 1] = True   # ped
    ag_type[:, 7, 2] = True   # cyc
    ag_size = np.zeros((n_sc, n_ag, 3), np.float32)
    ag_size[..., 0] = RNG.uniform(4.0, 5.5, (n_sc, n_ag))
    ag_size[..., 1] = RNG.uniform(1.8, 2.2, (n_sc, n_ag))
    ag_size[:, 6:, 0] = 1.0
    ag_size[:, 6:, 1] = 1.0

    ag_goal = np.zeros((n_sc, n_ag, 4), np.float32)
    ag_goal[..., :2] = RNG.uniform(-30, 30, (n_sc, n_ag, 2))
    ag_goal[..., 2] = RNG.uniform(-np.pi, np.pi, (n_sc, n_ag))
    ag_goal[0, 5] = np.float32([5.0, 5.0, 0.5, 0.0])  # agent 5 reaches this

    ag_dest = RNG.integers(0, n_mp, (n_sc, n_ag)).astype(np.int64)
    ag_dest[0, 5] = 0  # lane dest near agent 5's path

    tl_valid = np.ones((n_sc, n_tl), bool)
    tl_valid[:, 5] = False
    tl_pose = np.zeros((n_sc, n_tl, 3), np.float32)
    tl_pose[..., :2] = RNG.uniform(-30, 30, (n_sc, n_tl, 2))
    tl_pose[..., 2] = RNG.uniform(-np.pi, np.pi, (n_sc, n_tl))
    tl_pose[0, 0] = np.float32([10.0, 0.0, 0.0])  # red light on agent 4's path

    return dict(mp_boundary=mp_boundary, mp_valid=mp_valid, mp_type=mp_type,
                mp_pos=mp_pos, mp_dir=mp_dir, ag_type=ag_type, ag_size=ag_size,
                ag_goal=ag_goal, ag_dest=ag_dest, tl_valid=tl_valid, tl_pose=tl_pose)


def _script_trajectories(scene, T=30):
    n_sc, n_ag = scene["ag_type"].shape[:2]
    valid = np.ones((T, n_sc, n_ag), bool)
    valid[:, :, 7] = RNG.random((T, n_sc)) < 0.8
    pose = np.zeros((T, n_sc, n_ag, 3), np.float32)
    motion = np.zeros((T, n_sc, n_ag, 3), np.float32)
    # base: random walks
    pose[0, :, :, :2] = RNG.uniform(-25, 25, (n_sc, n_ag, 2))
    pose[0, :, :, 2] = RNG.uniform(-np.pi, np.pi, (n_sc, n_ag))
    vel = RNG.uniform(0.5, 4.0, (n_sc, n_ag))
    for t in range(1, T):
        pose[t] = pose[t - 1]
        pose[t, :, :, 0] += (vel * np.cos(pose[t - 1, :, :, 2]) * 0.1).astype(np.float32)
        pose[t, :, :, 1] += (vel * np.sin(pose[t - 1, :, :, 2]) * 0.1).astype(np.float32)
        pose[t, :, :, 2] += (RNG.standard_normal((n_sc, n_ag)) * 0.05).astype(np.float32)
    motion[..., 0] = vel[None]
    motion[..., 1] = RNG.standard_normal((T, n_sc, n_ag)) * 0.5
    motion[..., 2] = RNG.standard_normal((T, n_sc, n_ag)) * 0.1

    # scene 0 scripts:
    ts = np.arange(T, dtype=np.float32)
    # agent 0 exits the +x boundary (50) around t=15
    pose[:, 0, 0, 0] = 40.0 + ts * 1.0
    pose[:, 0, 0, 1] = 0.0
    pose[:, 0, 0, 2] = 0.0
    # agents 1,2 converge to overlap around t=20
    pose[:, 0, 1, 0] = -10.0 + ts * 0.5
    pose[:, 0, 1, 1] = 10.0
    pose[:, 0, 1, 2] = 0.0
    pose[:, 0, 2, 0] = 10.0 - ts * 0.5
    pose[:, 0, 2, 1] = 10.0
    pose[:, 0, 2, 2] = np.pi
    # agent 3 crosses the road edge at x=20 around t=10
    pose[:, 0, 3, 0] = 15.0 + ts * 0.6
    pose[:, 0, 3, 1] = -10.0
    pose[:, 0, 3, 2] = 0.0
    # agent 4 drives through the red light at (10, 0): inside then outside
    pose[:, 0, 4, 0] = 4.0 + ts * 0.8
    pose[:, 0, 4, 1] = 0.5
    pose[:, 0, 4, 2] = 0.0
    motion[:, 0, 4, 0] = 8.0
    # agent 5 creeps along the lane y=0 at low speed (passive after 20 steps)
    # then ends near its goal (5, 5, 0.5)
    pose[:, 0, 5, 0] = -15.0 + ts * 0.05
    pose[:, 0, 5, 1] = 0.3
    pose[:, 0, 5, 2] = 0.02
    motion[:, 0, 5, 0] = 0.4
    pose[26:, 0, 5, 0] = 5.0
    pose[26:, 0, 5, 1] = 4.0
    pose[26:, 0, 5, 2] = 0.45

    tl_state = np.zeros((T, n_sc, scene["tl_valid"].shape[1], 5), bool)
    st = RNG.integers(0, 5, (T, n_sc, scene["tl_valid"].shape[1]))
    for k in range(5):
        tl_state[..., k] = st == k
    tl_state[:, 0, 0] = False
    tl_state[:, 0, 0, 1] = True  # the scripted light stays STOP
    return valid, pose, motion, tl_state


def gen_rule_checker():
    scene = _build_scene()
    T = 30
    valid, pose, motion, tl_state = _script_trajectories(scene, T)

    checker = TrafficRuleChecker(
        mp_boundary=t32(scene["mp_boundary"]),
        mp_valid=torch.tensor(scene["mp_valid"]),
        mp_type=torch.tensor(scene["mp_type"]),
        mp_pos=t32(scene["mp_pos"]),
        mp_dir=t32(scene["mp_dir"]),
        ag_type=torch.tensor(scene["ag_type"]),
        ag_size=t32(scene["ag_size"]),
        ag_goal=t32(scene["ag_goal"]),
        ag_dest=torch.tensor(scene["ag_dest"]),
        tl_valid=torch.tensor(scene["tl_valid"]),
        tl_pose=t32(scene["tl_pose"]),
        disable_check=False,
    )
    keys = None
    traces = {}
    for t in range(T):
        v = checker.check(torch.tensor(valid[t]), t32(pose[t]), t32(motion[t]),
                          torch.tensor(tl_state[t]))
        if keys is None:
            keys = sorted(v)
            traces = {k: [] for k in keys}
        for k in keys:
            traces[k].append(_np(v[k]))
    outs = {k: np.stack(vs) for k, vs in traces.items()}  # [T, n_sc, n_ag]
    n_fired = {k: int(outs[k][-1].sum()) for k in keys if not k.endswith("_this_step")}
    print(f"    rule_checker fired: {n_fired}")
    assert all(v > 0 for v in n_fired.values()), f"some check never fired: {n_fired}"
    save("rule_checker",
         dict(valid=valid, pose=pose, motion=motion, tl_state=tl_state, **scene),
         outs, dict(T=T))


# --------------------------------------------------- WOMD post-processing


def gen_womd_post():
    """K=32 joint futures -> k_pred=6 marginal modes, all three aggregation
    paths + MPA-NMS + the score-temperature rescale
    (womd_post_processing.py:36-71)."""
    n_sc, n_ag, K, n_step = 2, 4, 32, 80
    # clustered futures: 3 well-separated motion modes per agent so MTR-NMS
    # suppression and the EM empty-cluster split both do real work
    centers = RNG.uniform(-40, 40, (n_sc, 1, 3, 1, 2)).astype(np.float32)
    assign = RNG.integers(0, 3, (n_sc, n_ag, K))
    t = np.linspace(0, 8, n_step, dtype=np.float32)[None, None, None, :, None]
    heading = RNG.uniform(-np.pi, np.pi, (n_sc, n_ag, K, 1, 1)).astype(np.float32)
    vel = np.concatenate([np.cos(heading), np.sin(heading)], -1) * RNG.uniform(
        1, 8, (n_sc, n_ag, K, 1, 1)).astype(np.float32)
    base = np.take_along_axis(
        np.broadcast_to(centers, (n_sc, n_ag, 3, 1, 2)), assign[:, :, :, None, None], axis=2)
    xy = base + vel * t + RNG.standard_normal((n_sc, n_ag, K, n_step, 2)).astype(np.float32)
    yaw = np.broadcast_to(heading, (n_sc, n_ag, K, n_step, 1)).astype(np.float32)
    trajs = np.concatenate([xy, yaw], -1)  # [n_sc, n_ag, K, n_step, 3]
    scores = (RNG.standard_normal((n_sc, n_ag, K)) * 2).astype(np.float32)  # log probs
    ag_type = np.zeros((n_sc, n_ag, 3), bool)
    for a in range(n_ag):
        ag_type[:, a, a % 3] = True

    # the reference forward takes [n_sc, K, n_ag, ...]
    trajs_t = t32(trajs).transpose(1, 2)
    scores_t = t32(scores).transpose(1, 2)
    cases = {
        "topk": dict(mpa_nms_thresh=[2.0, 2.0, 2.0], mtr_nms_thresh=[], aggr_thresh=[],
                     score_temperature=-1.0),
        "mtr": dict(mpa_nms_thresh=[2.0, 2.0, 2.0], mtr_nms_thresh=[2.5, 1.0, 1.5],
                    aggr_thresh=[], score_temperature=-1.0),
        "aggr": dict(mpa_nms_thresh=[], mtr_nms_thresh=[], aggr_thresh=[2.5],
                     score_temperature=0.5),
    }
    for name, kw in cases.items():
        m = WOMDPostProcessing(k_pred=6, n_iter_em=3, use_ade=True,
                               step_gt=90, step_current=10, **kw).eval()
        if m.aggr_thresh:
            # traj_aggr broadcasts `tensor < thresh`; this torch build rejects
            # a python list there (hydra's ListConfig passed through under the
            # reference's torch 1.11) — a 1-elem tensor broadcasts identically
            m.aggr_thresh = torch.tensor(m.aggr_thresh)
        out = m(torch.tensor(ag_type), trajs_t, scores_t)
        meta = {k: (v.tolist() if isinstance(v, np.ndarray) else v) for k, v in kw.items()}
        save(f"womd_post_{name}",
             dict(ag_type=ag_type, trajs=trajs, scores=scores),
             dict(trajs=out["trajs"], scores=out["scores"]), meta)


# ------------------------------------------------------- logging metrics


def gen_logging_metrics():
    """Reference ErrorMetrics / TrafficRuleMetrics running sums + compute
    normalization (metrics/logging.py), accumulated over TWO update calls.
    torchmetrics is absent from this image; its Metric base is stubbed (the
    reference classes use only add_state + attribute access —
    dist-reduce behavior is our metrics' own mesh-psum path, tested in
    tests/test_multiprocess_integration.py)."""
    import types as _t

    class _Metric:
        def __init__(self):
            pass

        def add_state(self, name, default=None, dist_reduce_fx=None):
            setattr(self, name, default)

    _tm = types.ModuleType("torchmetrics")
    _tmm = types.ModuleType("torchmetrics.metric")
    _tmm.Metric = _Metric
    _tm.metric = _tmm
    sys.modules.setdefault("torchmetrics", _tm)
    sys.modules.setdefault("torchmetrics.metric", _tmm)

    from models.metrics.logging import ErrorMetrics, TrafficRuleMetrics

    n_sc, K, n_ag, n_gt = 2, 3, 6, 21
    step_start, step_end = 1, n_gt - 1
    n_buf = step_end - step_start + 1

    batches = []
    for b in range(2):
        gt_valid = RNG.random((n_sc, n_ag, n_gt)) < 0.85
        gt_pose = (RNG.standard_normal((n_sc, n_ag, n_gt, 3)) * [15, 15, 1]).astype(np.float32)
        gt_motion = (RNG.standard_normal((n_sc, n_ag, n_gt, 3)) * 3).astype(np.float32)
        pred_valid1 = RNG.random((n_sc, 1, n_ag, n_buf)) < 0.9
        pred_pose1 = gt_pose[:, None, :, step_start:] + (
            RNG.standard_normal((n_sc, 1, n_ag, n_buf, 3)) * 0.8).astype(np.float32)
        pred_motion1 = gt_motion[:, None, :, step_start:] + (
            RNG.standard_normal((n_sc, 1, n_ag, n_buf, 3)) * 0.5).astype(np.float32)
        pred_validK = RNG.random((n_sc, K, n_ag, n_buf)) < 0.9
        viol = {k: RNG.random((n_sc, K, n_ag, n_buf)) < p for k, p in [
            ("outside_map", 0.02), ("collided", 0.05), ("run_road_edge", 0.04),
            ("run_red_light", 0.03), ("passive", 0.03), ("goal_reached", 0.1),
            ("dest_reached", 0.08)]}
        ag_type = np.zeros((n_sc, n_ag, 3), bool)
        for a in range(n_ag):
            ag_type[:, a, a % 3] = True
        batches.append(dict(gt_valid=gt_valid, gt_pose=gt_pose, gt_motion=gt_motion,
                            pred_valid1=pred_valid1, pred_pose1=pred_pose1,
                            pred_motion1=pred_motion1, pred_validK=pred_validK,
                            ag_type=ag_type, **{f"viol_{k}": v for k, v in viol.items()}))

    em = ErrorMetrics(prefix="reactive_replay")
    trm = TrafficRuleMetrics(prefix="reactive_replay")
    for b in batches:
        buf1 = _t.SimpleNamespace(
            pred_valid=torch.tensor(b["pred_valid1"]), pred_pose=t32(b["pred_pose1"]),
            pred_motion=t32(b["pred_motion1"]), step_start=step_start, step_end=step_end)
        em.update(buf1, torch.tensor(b["gt_valid"]), t32(b["gt_pose"]), t32(b["gt_motion"]))
        bufK = _t.SimpleNamespace(
            pred_valid=torch.tensor(b["pred_validK"]),
            violation={k[5:]: torch.tensor(v) for k, v in b.items() if k.startswith("viol_")})
        trm.update(bufK, torch.tensor(b["ag_type"]))
    out = {k.replace("/", "__"): _np(v) for k, v in {**em.compute(), **trm.compute()}.items()}

    ins = {}
    for i, b in enumerate(batches):
        ins.update({f"b{i}_{k}": v for k, v in b.items()})
    save("logging_metrics", ins, out, dict(step_start=step_start, n_batches=2))


# ------------------------------------------------ scene-centric preprocessing


def gen_preprocessing():
    """L2 preprocessing vs the reference's SceneCentricPreProcessing
    (scene_centric.py:39-147): sc/* inputs, gt/* targets, ref/* metadata,
    the invalid-TL-step -> UNKNOWN merge, and the lane/stop tl_pose paths.
    Dropout off (RNG streams are framework-specific; the dropout mask
    semantics are pinned separately in our unit tests)."""
    from data_modules.scene_centric import SceneCentricPreProcessing

    from trafficbotsv15_tpu.config import tiny_config
    from trafficbotsv15_tpu.data.synthetic import make_batch

    cfg = tiny_config()
    data_size = {
        "agent/cmd": [8], "agent/goal": [4], "map/valid": [cfg.data.n_mp_pl_node],
        "map/type": [11], "tl_stop/state": [5], "agent/spd": [1], "agent/acc": [1],
        "agent/yaw_rate": [1], "agent/size": [3], "agent/type": [3],
    }
    cases = {
        "train_lane_dest": dict(tl_mode="lane", navi_mode="dest", training=True,
                                test_mode=False),
        "train_stop_cmd": dict(tl_mode="stop", navi_mode="cmd", training=True,
                               test_mode=False),
        "test_lane_goal": dict(tl_mode="lane", navi_mode="goal", training=False,
                               test_mode=True),
    }
    for name, kw in cases.items():
        batch_np = make_batch(cfg.data, n_sc=2, seed=11, test_mode=kw["test_mode"])
        m = SceneCentricPreProcessing(
            time_step_current=10, tl_mode=kw["tl_mode"], navi_mode=kw["navi_mode"],
            dropout_p_history=-1.0, data_size=data_size)
        m.train(kw["training"])
        tb = {k: torch.tensor(v) for k, v in batch_np.items()
              if not k.startswith("scenario")}
        if kw["tl_mode"] == "stop":
            # LATENT REFERENCE BUG: stop-mode tl_pose cats [n_sc, n_tl, 2]
            # pos with a 2-D atan2 (scene_centric.py:89-95 — no [..., [1]]
            # keepdim slicing like the mp_pose path) -> RuntimeError. The
            # flagship runs tl_mode=lane so the path never executed upstream.
            # Golden the evident intent: shim atan2 to keep the last dim for
            # the one 2-D call site; every other call keeps dims already.
            orig_atan2 = torch.atan2

            def keepdim_atan2(a, b):
                r = orig_atan2(a, b)
                return r.unsqueeze(-1) if r.dim() == 2 else r

            torch.atan2 = keepdim_atan2
            try:
                out = m(dict(tb))
            finally:
                torch.atan2 = orig_atan2
        else:
            out = m(dict(tb))
        outs = {k.replace("/", "__"): v for k, v in out.items()
                if (k.startswith(("sc/", "gt/", "ref/")) and v is not None)}
        save(f"preproc_{name}", {k.replace("/", "__"): v for k, v in batch_np.items()
                                 if not k.startswith("scenario")},
             outs, dict(tl_mode=kw["tl_mode"], navi_mode=kw["navi_mode"],
                        training=kw["training"]))


# ------------------------------------------------------- teacher forcing


def gen_teacher_forcing():
    """Reference TeacherForcing init+get over every step, for the
    DETERMINISTIC config subspace (probs in {0, 1}: torch.bernoulli(0/1) is
    exact, so the masks are RNG-free and framework-portable). Covers spawn
    rising-edge, warm start, epoch-decayed horizon, prob=1 agent forcing,
    gt_sdc, the error-threshold resets against scripted drifting preds, and
    the out-of-range zero-override branch (teacher_forcing.py:50-167)."""
    from utils.teacher_forcing import TeacherForcing

    n_sc, n_ag, n_tl, n_step = 2, 6, 4, 20
    ag_valid = RNG.random((n_sc, n_ag, n_step)) < 0.9
    ag_valid[:, 0] = True  # SDC always valid
    ag_valid[:, 1, :7] = False  # late spawn -> rising edge inside spawn window
    ag_valid[:, 2, 13:] = False
    ag_pose = (RNG.standard_normal((n_sc, n_ag, n_step, 3)) * [20, 20, 1]).astype(np.float32)
    ag_motion = (RNG.standard_normal((n_sc, n_ag, n_step, 3)) * 3).astype(np.float32)
    tl_state = np.zeros((n_sc, n_tl, n_step, 5), bool)
    st = RNG.integers(0, 5, (n_sc, n_tl, n_step))
    for k in range(5):
        tl_state[..., k] = st == k
    # scripted preds: GT at step-1 plus per-agent drifts that straddle the
    # thresholds (agent 3 big xy, agent 4 big yaw, agent 5 big spd)
    drift_pose = np.zeros((n_sc, n_ag, 3), np.float32)
    drift_pose[:, 3, :2] = 5.0
    drift_pose[:, 4, 2] = 1.0  # ~57 deg
    drift_motion = np.zeros((n_sc, n_ag, 3), np.float32)
    drift_motion[:, 5, 0] = 4.0
    pred_valid = ag_valid.copy()

    cases = {
        "flagship": dict(step_spawn_agent=10, step_warm_start=10, step_horizon=20,
                         step_horizon_decrease_per_epoch=10, prob_forcing_agent=0.0,
                         gt_sdc=False, epoch=1),
        "reset": dict(step_spawn_agent=10, step_warm_start=3, step_horizon=0,
                      step_horizon_decrease_per_epoch=0, prob_forcing_agent=0.0,
                      gt_sdc=False, threshold_xy=2.0, threshold_yaw=15.0,
                      threshold_spd=2.0, epoch=0),
        "gtsdc_prob1": dict(step_spawn_agent=0, step_warm_start=0, step_horizon=0,
                            step_horizon_decrease_per_epoch=0, prob_forcing_agent=1.0,
                            gt_sdc=True, epoch=0),
    }
    for name, kw in cases.items():
        epoch = kw.pop("epoch")
        tf = TeacherForcing(**kw)
        tf.init(torch.tensor(ag_valid), t32(ag_pose), t32(ag_motion),
                torch.tensor(tl_state), current_epoch=epoch)
        # capture BEFORE the get() loop: the reference's error-reset `|=`
        # lands on a slice VIEW of ag_teacher_forcing (teacher_forcing.py:129,
        # 137-145), so get() mutates the stored mask in place. Harmless
        # upstream (each step is read exactly once per rollout, and init()
        # rebuilds the mask per rollout) but the precomputed-mask golden must
        # be the post-init state.
        forcing_mask = _np(tf.ag_teacher_forcing).copy()
        ag_valid_steps, tl_valid_steps = [], []
        for step in range(n_step + 1):  # n_step = out-of-range branch
            s = max(step - 1, 0)
            pv = t32(ag_pose[:, :, s]) + t32(drift_pose)
            mv = t32(ag_motion[:, :, s]) + t32(drift_motion)
            ag_ov, tl_ov = tf.get(step, torch.tensor(pred_valid[:, :, s]), pv, mv)
            ag_valid_steps.append(_np(ag_ov["valid"]))
            tl_valid_steps.append(_np(tl_ov["valid"]))
        save(f"teacher_forcing_{name}",
             dict(ag_valid=ag_valid, ag_pose=ag_pose, ag_motion=ag_motion,
                  tl_state=tl_state, drift_pose=drift_pose, drift_motion=drift_motion,
                  pred_valid=pred_valid, forcing_mask=forcing_mask),
             dict(ag_override_valid=np.stack(ag_valid_steps),
                  tl_override_valid=np.stack(tl_valid_steps)),
             dict(epoch=epoch, **kw))


# ------------------------------------------------ WOSAC post-processing


def gen_wosac_post():
    """Reference WOSACPostProcessing tensor path: K=40 -> best-32 future
    selection by (collision + w*road-edge) violation count over role agents,
    then the scene-centric -> global WOMD frame transform for sim and no_sim
    agents (wosac_post_processing.py:31-101). Violation scores are engineered
    so the 32-future cutoff is TIE-FREE (scene 0: exactly 32 clean futures;
    scene 1: 31 clean + one lone road-edge) — the selected SET is then
    unique even though both frameworks' topk leave the order unspecified.
    Proto assembly is covered separately by the byte-pinned submission
    goldens (tests/test_submission_protos.py)."""
    import types as _t

    # the reference module imports waymo proto/spec modules at module level;
    # forward() touches neither. Protos come from the repo's compiled stub
    # (tests/waymo_stub); submission_specs gets an empty placeholder.
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests" / "waymo_stub"))
    for name in ("waymo_open_dataset.utils", "waymo_open_dataset.utils.sim_agents",
                 "waymo_open_dataset.utils.sim_agents.submission_specs"):
        sys.modules.setdefault(name, types.ModuleType(name))

    from data_modules.wosac_post_processing import WOSACPostProcessing

    n_sc, K, n_ag, n_step, n_hist, n_ns = 2, 40, 6, 31, 11, 5
    fut0 = 11
    pred_pose = (RNG.standard_normal((n_sc, K, n_ag, n_step, 3)) * [30, 30, 1]).astype(np.float32)
    role = np.zeros((n_sc, n_ag, 3), bool)
    role[:, 0, 0] = role[:, 2, 1] = role[:, 4, 2] = True  # 3 role agents

    collided = np.zeros((n_sc, K, n_ag, n_step), bool)
    road = np.zeros((n_sc, K, n_ag, n_step), bool)
    # scene 0: futures 0..7 violate (distinct-enough, all strictly > 0)
    for k in range(8):
        collided[0, k, 0, fut0 + k % 15] = True
        if k % 2:
            road[0, k, 2, fut0 + 2] = True
    # scene 1: future 0 has ONE road-edge touch (score 0.4), futures 1..8
    # have collisions (score >= 1); 31 futures are clean
    road[1, 0, 4, fut0 + 3] = True
    for k in range(1, 9):
        collided[1, k, 0, fut0 + k] = True
        collided[1, k, 2, fut0 + k] = k % 2 == 0
    violation = {
        "collided_wosac": collided, "collided": collided, "run_road_edge": road,
        "outside_map": np.zeros_like(collided), "passive": np.zeros_like(collided),
        "goal_reached": np.zeros_like(collided), "dest_reached": np.zeros_like(collided),
    }
    buffer = _t.SimpleNamespace(
        pred_pose=t32(pred_pose),
        violation={k: torch.tensor(v) for k, v in violation.items()},
        step_future_start=fut0,
    )
    batch = {
        "ref/ag_role": torch.tensor(role),
        "scenario_center": t32(RNG.uniform(-3000, 3000, (n_sc, 2))),
        "scenario_yaw": t32(RNG.uniform(-np.pi, np.pi, n_sc)),
        "scenario_id": [f"sc{j}_golden" for j in range(n_sc)],
        "history/agent/valid": torch.tensor(np.ones((n_sc, n_ag, n_hist), bool)),
        "history/agent/pos": t32(RNG.standard_normal((n_sc, n_ag, n_hist, 3)) * 20),
        "history/agent/object_id": torch.tensor(np.arange(n_sc * n_ag).reshape(n_sc, n_ag) + 1),
        "history/agent_no_sim/valid": torch.tensor(np.ones((n_sc, n_ns, n_hist), bool)),
        "history/agent_no_sim/pos": t32(RNG.standard_normal((n_sc, n_ns, n_hist, 3)) * 20),
        "history/agent_no_sim/yaw_bbox": t32(RNG.uniform(-np.pi, np.pi, (n_sc, n_ns, n_hist, 1))),
        "history/agent_no_sim/object_id": torch.tensor(
            np.arange(n_sc * n_ns).reshape(n_sc, n_ns) + 100),
    }
    m = WOSACPostProcessing(step_gt=n_step - 1, step_current=10, const_vel_z_sim=True,
                            const_vel_no_sim=True, w_road_edge=0.4, use_wosac_col=True)
    out = m(batch, buffer)
    save("wosac_post",
         dict(pred_pose=pred_pose, role=role, **{k.replace("/", "__"): v for k, v in
              {kk: vv for kk, vv in batch.items() if kk != "scenario_id"}.items()},
              **{f"viol_{k}": v for k, v in violation.items()}),
         dict(pos_sim=out["pos_sim"], yaw_sim=out["yaw_sim"],
              pos_no_sim=out["pos_no_sim"], yaw_no_sim=out["yaw_no_sim"]),
         dict(w_road_edge=0.4, use_wosac_col=True, step_future_start=fut0))


# ---------------------------------------------------------------- dynamics
def gen_dynamics():
    """Stateful reference Dynamics over a scripted multi-step scenario
    (src/utils/dynamics.py:11-222): per-type MultiPathPP action bounding +
    midpoint integration, player overrides, teacher-forcing override_ag,
    override_tl argmax+GT, sticky disable_ag, disable_navi/override_navi —
    plus the StateIntegrator variant at function level (dynamics.py:277-318).
    """
    _hy = types.ModuleType("hydra")
    _hy_utils = types.ModuleType("hydra.utils")

    def _instantiate(cfg, **kw):
        import utils.dynamics as rd

        cls = getattr(rd, cfg["_target_"].split(".")[-1])
        kwargs = {k: v for k, v in cfg.items() if k != "_target_"}
        kwargs.update(kw)
        return cls(**kwargs)

    _hy_utils.instantiate = _instantiate
    _hy.utils = _hy_utils
    sys.modules.setdefault("hydra", _hy)
    sys.modules.setdefault("hydra.utils", _hy_utils)

    from torch.distributions import Categorical, Independent, Normal  # noqa: E402
    from utils.dynamics import Dynamics, StateIntegrator  # noqa: E402

    n_sc, n_ag, n_tl, T = 2, 6, 3, 16
    rng = np.random.default_rng(20260821)

    def cfgd(acc, yr):
        return DotDict({"_target_": "utils.dynamics.MultiPathPP", "max_acc": acc, "max_yaw_rate": yr})

    for case, navi_mode, veh_all in (
        ("dynamics_dest", "dest", False),
        ("dynamics_goal", "goal", False),
        ("dynamics_vehall", "dest", True),
    ):
        # flagship bounds (configs/model/sim_agent.yaml:154-167): veh 5/1.5, ped 7/7, cyc 6/3
        dyn = Dynamics(veh=cfgd(5, 1.5), ped=cfgd(7, 7), cyc=cfgd(6, 3),
                       navi_mode=navi_mode, use_veh_dynamics_for_all=veh_all)
        ag_type = torch.zeros(n_sc, n_ag, 3, dtype=torch.bool)
        for a in range(n_ag):
            ag_type[:, a, a // 2] = True  # 2 veh, 2 ped, 2 cyc
        gt_valid = torch.ones(n_sc, n_ag, T, dtype=torch.bool)
        gt_valid[0, 5, 0] = False  # scene-0 agent 5 starts invalid, spawned at t=10
        gt_pose = t32(rng.normal(0, 10, (n_sc, n_ag, T, 3)))
        gt_motion = t32(rng.normal(0, 2, (n_sc, n_ag, T, 3)))
        tl_state0 = torch.zeros(n_sc, n_tl, T, 5, dtype=torch.bool)
        tl_state0[..., 0] = True
        if navi_mode == "dest":
            ag_navi = torch.tensor(rng.integers(0, 50, (n_sc, n_ag)))
        else:
            ag_navi = t32(rng.normal(0, 5, (n_sc, n_ag, 4)))
        dyn.init(tl_state=tl_state0, gt_valid=gt_valid, gt_pose=gt_pose,
                 gt_motion=gt_motion, ag_type=ag_type,
                 ag_attr=t32(rng.normal(0, 1, (n_sc, n_ag, 4))), ag_latent=None,
                 ag_latent_valid=None, ag_navi=ag_navi,
                 ag_navi_valid=torch.ones(n_sc, n_ag, dtype=torch.bool))

        locs = t32(rng.normal(0, 1.2, (T, n_sc, n_ag, 2)))
        scales = t32(np.exp(rng.normal(-0.5, 0.3, (T, n_sc, n_ag, 2))))
        po_valid = torch.zeros(T, n_sc, n_ag, dtype=torch.bool)
        po_valid[5:8, :, 0] = True
        po_valid[6, :, 1] = True
        po_action = t32(rng.normal(0, 2, (T, n_sc, n_ag, 2)))
        tf_valid = torch.zeros(T, n_sc, n_ag, dtype=torch.bool)
        tf_valid[3, :, 2] = True
        tf_valid[10, 0, 5] = True  # spawn
        tf_valid[12, :, 3] = True
        tf_valid[13, :, 2] = True  # re-force agent 2 AFTER its t=12 disable: must stay out
        tf_pose = t32(rng.normal(0, 10, (T, n_sc, n_ag, 3)))
        tf_motion = t32(rng.normal(0, 2, (T, n_sc, n_ag, 3)))
        tl_probs = t32(rng.dirichlet(np.ones(5), (T, n_sc, n_tl)))
        tl_ov_valid = torch.zeros(T, n_sc, n_tl, dtype=torch.bool)
        tl_ov_valid[::2, :, 0] = True
        tl_ov_valid[7:, 1, 2] = True
        tl_ov_state = torch.zeros(T, n_sc, n_tl, 5, dtype=torch.bool)
        tl_ov_state[..., 1] = True
        outside = torch.zeros(T, n_sc, n_ag, dtype=torch.bool)
        outside[12, :, 2] = True
        outside[14, 0, 3] = True
        dis_gt_valid = torch.ones(T, n_sc, n_ag, dtype=torch.bool)
        dis_gt_valid[12, :, 2] = False  # agent 2 not GT-protected -> disabled at t=12
        reached = torch.zeros(T, n_sc, n_ag, dtype=torch.bool)
        reached[6, :, 0] = True
        reached[9, 1, 4] = True
        if navi_mode == "dest":
            new_navi = torch.tensor(rng.integers(0, 50, (T, n_sc, n_ag)))
        else:
            new_navi = t32(rng.normal(0, 5, (T, n_sc, n_ag, 4)))

        keys = ("action", "action_log_prob", "ag_valid", "ag_disabled", "ag_pose",
                "ag_motion", "tl_state", "ag_navi", "ag_navi_valid", "mask_navi_reached")
        outs = {k: [] for k in keys}
        for t in range(T):
            dist = Independent(Normal(locs[t], scales[t]), 1)
            po = {"valid": po_valid[t], "action": po_action[t]} if bool(po_valid[t].any()) else None
            action, lp = dyn.update_ag(dist, deterministic=True, player_override=po)
            dyn.override_ag({"valid": tf_valid[t], "pose": tf_pose[t], "motion": tf_motion[t]})
            dyn.override_tl(Categorical(probs=tl_probs[t]),
                            {"valid": tl_ov_valid[t], "state": tl_ov_state[t]})
            dyn.disable_ag({"outside_map_this_step": outside[t]}, dis_gt_valid[t])
            dyn.disable_navi({"dest_reached_this_step": reached[t],
                              "goal_reached_this_step": reached[t]})
            if bool(reached[t].any()):
                dyn.override_navi(new_navi[t])
            for k, v in (("action", action), ("action_log_prob", lp),
                         ("ag_valid", dyn.ag_valid), ("ag_disabled", dyn.ag_disabled),
                         ("ag_pose", dyn.ag_pose), ("ag_motion", dyn.ag_motion),
                         ("tl_state", dyn.tl_state), ("ag_navi", dyn.ag_navi),
                         ("ag_navi_valid", dyn.ag_navi_valid),
                         ("mask_navi_reached", dyn.mask_navi_reached)):
                outs[k].append(_np(v).copy())
        save(case,
             dict(ag_type=ag_type, gt_valid=gt_valid, gt_pose=gt_pose, gt_motion=gt_motion,
                  tl_state0=tl_state0, ag_navi0=ag_navi, locs=locs, scales=scales,
                  po_valid=po_valid, po_action=po_action, tf_valid=tf_valid,
                  tf_pose=tf_pose, tf_motion=tf_motion, tl_probs=tl_probs,
                  tl_ov_valid=tl_ov_valid, tl_ov_state=tl_ov_state, outside=outside,
                  dis_gt_valid=dis_gt_valid, reached=reached, new_navi=new_navi),
             {k: np.stack(v) for k, v in outs.items()},
             meta={"navi_mode": navi_mode, "veh_all": veh_all, "dt": 0.1})

    # StateIntegrator at function level (never wired into the flagship yaml,
    # but selectable via the hydra dynamics block)
    si = StateIntegrator(dt=0.1, max_v=3)
    act_unb = t32(rng.normal(0, 1.5, (2, 6, 2)))
    pose = t32(rng.normal(0, 10, (2, 6, 3)))
    motion = t32(rng.normal(0, 2, (2, 6, 3)))
    act = si.process_action(act_unb)
    pp, pm = si.update(pose, motion, act)
    save("dynamics_integrator",
         dict(action_unbounded=act_unb, pose=pose, motion=motion),
         dict(action=act, pred_pose=pp, pred_motion=pm),
         meta={"dt": 0.1, "max_v": 3.0})


if __name__ == "__main__":
    torch.set_grad_enabled(False)
    print("generating sim goldens ->", OUT)
    gen_pose_emb()
    gen_wosac_collision()
    gen_rewards()
    gen_rule_checker()
    gen_womd_post()
    gen_preprocessing()
    gen_teacher_forcing()
    gen_wosac_post()
    gen_logging_metrics()
    gen_dynamics()
    print("done")
