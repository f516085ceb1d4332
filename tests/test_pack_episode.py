"""Tests for the offline ETL packing library: full pipeline from raw polylines/
agent tracks to the fixed-shape h5 episode schema."""

import numpy as np
import pytest

from trafficbotsv15_tpu.config import DataCfg
from trafficbotsv15_tpu.data import pack_episode as pk
from trafficbotsv15_tpu.data.h5_dataset import tensor_size_train

RNG = np.random.default_rng(0)


def _raw_scenario(n_pl=30, n_ag=10, n_step=91):
    mp_id, mp_xyz, mp_type = [], [], []
    for i in range(n_pl):
        start = RNG.uniform(-100, 100, 3)
        start[2] = 0
        heading = RNG.uniform(-np.pi, np.pi)
        n_pts = int(RNG.integers(5, 50))
        pts = [start + np.array([np.cos(heading), np.sin(heading), 0]) * 2 * j for j in range(n_pts)]
        mp_id.append(i)
        mp_xyz.append([list(p) for p in pts])
        mp_type.append(int(i % 11))
    mp_edge = [[i, (i + 1) % n_pl] for i in range(n_pl)]

    ag_id, ag_type, ag_state, ag_role = [], [], [], []
    for a in range(n_ag):
        ag_id.append(100 + a)
        typ = int(RNG.integers(0, 3))
        ag_type.append(typ)
        role = [a == 0, False, a == 1]
        ag_role.append(role)
        states = []
        pos = RNG.uniform(-50, 50, 2)
        yaw = RNG.uniform(-np.pi, np.pi)
        spd = RNG.uniform(0, 10)
        t0 = 0 if a < n_ag - 2 else 15  # two agents appear later
        for t in range(n_step):
            valid = t >= t0 and (a != n_ag - 1 or t < 60)
            vx, vy = spd * np.cos(yaw), spd * np.sin(yaw)
            states.append([pos[0], pos[1], 0.0, 4.5, 2.0, 1.5, yaw, vx, vy, float(valid)])
            pos = pos + np.array([vx, vy]) * 0.1
            yaw += RNG.uniform(-0.01, 0.01)
        ag_state.append(states)

    tl_lane_state = [[1, 2] for _ in range(n_step)]
    tl_lane_id = [[3, 7] for _ in range(n_step)]
    tl_stop_point = [[[1.0, 2.0, 0.0], [5.0, 6.0, 0.0]] for _ in range(n_step)]
    return dict(
        mp_id=mp_id, mp_xyz=mp_xyz, mp_type=mp_type, mp_edge=mp_edge,
        ag_id=ag_id, ag_type=ag_type, ag_state=ag_state, ag_role=ag_role,
        tl_lane_state=tl_lane_state, tl_lane_id=tl_lane_id, tl_stop_point=tl_stop_point,
    )


def pack_full(raw, n_ag_h5=8, n_mp_h5=24, step_current=10):
    episode = {}
    pk.pack_episode_map(episode, raw["mp_id"], raw["mp_xyz"], raw["mp_type"], raw["mp_edge"], 512, 20)
    pk.pack_episode_traffic_lights(
        episode, step_current, raw["tl_lane_state"], raw["tl_lane_id"], raw["tl_stop_point"], True, False, 64)
    pk.pack_episode_agents(
        episode, step_current, raw["ag_id"], raw["ag_type"], raw["ag_state"], raw["ag_role"], True, False, 64)
    center, yaw = pk.center_at_sdc(episode, step_current, rand_pos=-1, rand_yaw=-1)
    pk.filter_episode_map(episode, step_current, n_mp_h5, dist_thresh_mp=200)
    reduced = {}
    pk.repack_episode_map(episode, reduced, n_mp_h5, 11)
    pk.filter_episode_traffic_lights(episode)
    pk.repack_episode_traffic_lights(episode, reduced, 32, 5)
    mask_sim, mask_no_sim = pk.filter_episode_agents(episode, reduced, step_current, n_ag_h5, dist_thresh_ag=100)
    pk.repack_episode_agents(episode, reduced, mask_sim, n_ag_h5, rng=np.random.default_rng(0))
    reduced["map/boundary"] = pk.get_map_boundary(reduced["map/valid"], reduced["map/pos"])
    return episode, reduced, center, yaw, mask_sim


def test_pack_map_splits_polylines():
    raw = _raw_scenario()
    episode = {}
    n = pk.pack_episode_map(episode, raw["mp_id"], raw["mp_xyz"], raw["mp_type"], raw["mp_edge"], 512, 20)
    assert n > len(raw["mp_id"])  # long polylines are split
    assert episode["map/valid"][:n].any(-1).all()
    # dir = diff of pos within each segment
    for p in range(3):
        v = episode["map/valid"][p]
        pos = episode["map/pos"][p][v]
        d = episode["map/dir"][p][v]
        if v.sum() > 1:
            np.testing.assert_allclose(pos[1] - pos[0], d[0], atol=1e-5)
    # no segment longer than 20 nodes
    assert episode["map/valid"].sum(-1).max() <= 20


def test_center_at_sdc():
    raw = _raw_scenario()
    episode, reduced, center, yaw, _ = pack_full(raw)
    # sdc (agent 0) at step_current must be at origin with yaw 0
    np.testing.assert_allclose(reduced["agent/pos"][0, 10, :2], 0.0, atol=1e-4)
    np.testing.assert_allclose(reduced["agent/yaw_bbox"][0, 10, 0], 0.0, atol=1e-4)


def test_full_pipeline_schema():
    raw = _raw_scenario()
    episode, reduced, _, _, mask_sim = pack_full(raw)
    cfg = DataCfg(n_ag=8, n_mp=24, n_tl_lane=32, n_tl_stop=64)
    schema = tensor_size_train(cfg)
    for k in ("agent/valid", "agent/pos", "agent/spd", "agent/acc", "agent/yaw_rate",
              "agent/type", "agent/role", "agent/size", "agent/goal", "agent/dest",
              "map/valid", "map/type", "map/pos", "map/dir",
              "tl_lane/valid", "tl_lane/state", "tl_lane/idx"):
        assert k in reduced, k
        assert tuple(reduced[k].shape) == schema[k], (k, reduced[k].shape, schema[k])
    assert reduced["map/boundary"].shape == (4,)
    # <= 8 agents valid, sdc first
    assert reduced["agent/valid"].any(-1).sum() <= 8
    assert reduced["agent/role"][0, 0]
    # interpolation fills internal gaps: valid runs are contiguous
    v = reduced["agent/valid"]
    for a in range(8):
        if v[a].any():
            idx = np.where(v[a])[0]
            assert (np.diff(idx) == 1).all()
    # acc consistent with interpolated spd
    a0 = np.where(v[0])[0]
    spd, acc = reduced["agent/spd"][0, :, 0], reduced["agent/acc"][0, :, 0]
    for t in a0[1:5]:
        np.testing.assert_allclose(acc[t], (spd[t] - spd[t - 1]) / 0.1, atol=1e-3)
    # dest indices point at valid polylines
    dests = reduced["agent/dest"][v.any(-1)]
    assert (dests >= 0).all() and (dests < 24).all()


def test_classify_track():
    n = 50
    valid = np.ones(n, bool)
    # stationary
    assert pk.classify_track(valid, np.zeros((n, 2)), np.zeros(n), np.zeros(n)) == 0
    # straight at 10 m/s
    pos = np.stack([np.linspace(0, 50, n), np.zeros(n)], -1)
    assert pk.classify_track(valid, pos, np.zeros(n), np.full(n, 10.0)) == 1
    # left turn: heading goes +pi/2, lateral displacement positive
    yaw = np.linspace(0, np.pi / 2, n)
    pos = np.stack([np.sin(yaw) * 20, (1 - np.cos(yaw)) * 20], -1)
    assert pk.classify_track(valid, pos, yaw, np.full(n, 5.0)) == 5
    # right turn
    yaw = np.linspace(0, -np.pi / 2, n)
    pos = np.stack([np.sin(-yaw) * 20, -(1 - np.cos(yaw)) * 20], -1)
    assert pk.classify_track(valid, pos, yaw, np.full(n, 5.0)) == 7


def test_get_polylines_from_polygon():
    poly = np.array([[0, 0, 0], [10, 0, 0], [10, 2, 0], [0, 2, 0]], float)
    pls = pk.get_polylines_from_polygon(poly)
    assert len(pls) == 4
    assert len(pls[0]) >= 10


def test_find_dest_out_of_contract_guards():
    """find_dest's two defensive guards for inputs the REFERENCE CRASHES on
    (out-of-contract for the parity corpus, hence unit-tested here):

    - zero road-edge polylines: the reference indexes argmin of an empty
      norm (pack_h5.py:920) -> ValueError; we return polyline 0
      (pack_episode.py:602).
    - a lane-associated dest whose map id has NO outgoing edge row: the
      reference does np.random.choice([]) (pack_h5.py:904) -> ValueError;
      we stop the topology walk at the current lane (pack_episode.py:618).
      Real WOMD encodes lane ends as explicit id -> -1 edge rows, so a
      missing row never occurs in-contract.
    """
    rng = np.random.default_rng(0)
    empty = np.zeros((0, 2))
    # ped agent + no road edges -> guard returns 0
    dest = pk.find_dest(
        np.array([False, True, False]), np.array([1.0, 2.0, 0.0, 3.0]),
        np.zeros((0, 2), np.int64),
        empty, empty, np.zeros(0, np.int64), np.zeros(0, np.int64),
        empty, empty, np.zeros(0, np.int64),
        empty, np.zeros(0, np.int64), rng=rng)
    assert dest == 0

    # vehicle on an aligned lane whose id has no outgoing edge: walk breaks,
    # dest stays the associated lane
    pos_lane = np.array([[0.5, 0.0]])
    dir_lane = np.array([[1.0, 0.0]])
    dest = pk.find_dest(
        np.array([True, False, False]), np.array([0.0, 0.0, 0.0, 5.0]),
        np.zeros((0, 2), np.int64),  # no edges at all
        pos_lane, dir_lane, np.array([77]), np.array([9]),
        empty, empty, np.zeros(0, np.int64),
        np.array([[100.0, 100.0]]), np.array([3]), rng=rng)
    assert dest == 9
