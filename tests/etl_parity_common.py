"""Shared driver for the ETL bit-parity harness.

`make_raw(seed)` builds a synthetic raw scenario in the collated-feature
format both packers consume; `run_pipeline(mod, raw, dataset, is_ref)` drives
a pack_h5-style module through the exact call sequence of the packer CLIs
(ours: scripts/pack_h5_womd.py:133-199; reference:
/root/reference/scripts/pack_h5_womd.py:236-331). The same driver runs either
module — signatures are mirrored, with `is_ref` covering the rng-passing
difference (the reference draws from the np.random global; ours accepts an
rng, so we pass the np.random module itself to align the draw sequence).

Used by scripts/gen_etl_golden.py (offline, against /root/reference) to emit
tests/golden/etl_parity_golden.npz, and by tests/test_etl_parity.py to diff
our packer against those goldens bit for bit.
"""

from __future__ import annotations

import numpy as np

# small sizes that still trigger every filter loop (map reduction halving,
# agent down-selection, interpolation over validity gaps)
N_MP_DATA, N_TL_DATA, N_AG_DATA = 512, 64, 64
N_MP_H5, N_TL_LANE_H5, N_AG_H5_SIM, N_AG_H5_NO_SIM = 24, 32, 8, 16
N_MP_TYPE, N_TL_STATE, N_MP_PL_NODE = 11, 5, 20
DIM_VEH_LANES, DIM_CYC_LANES, DIM_PED_LANES = [0, 1, 2], [3], [4]
STEP_CURRENT = 10
DIST_THRESH_MP, DIST_THRESH_AG = 200.0, 100.0


def make_raw(seed: int, n_pl: int = 60, n_ag: int = 12, n_step: int = 91):
    rng = np.random.default_rng(seed)
    mp_id, mp_xyz, mp_type = [], [], []
    for i in range(n_pl):
        # first 12 polylines: road-edge type (map/type dim 4) near the agents,
        # so dest-finding always has road edges after the map reduction
        near = i < 12
        start = rng.uniform(-40, 40, 3) if near else rng.uniform(-150, 150, 3)
        start[2] = rng.uniform(-1, 1)
        heading = rng.uniform(-np.pi, np.pi)
        n_pts = int(rng.integers(5, 60))
        step_v = rng.uniform(1.0, 3.0)
        pts = [
            start + np.array([np.cos(heading), np.sin(heading), 0.0]) * step_v * j
            for j in range(n_pts)
        ]
        mp_id.append(i)
        mp_xyz.append([list(p) for p in pts])
        # bias toward lane/road-edge types (0-4) so dest-finding always has
        # road-edge polylines (map/type dim 4) after the map reduction
        mp_type.append(4 if near else (int(i % 5) if i < n_pl // 2 else int(i % N_MP_TYPE)))
    mp_edge = [[i, (i + 1) % n_pl] for i in range(n_pl)] + [[i, (i + 3) % n_pl] for i in range(0, n_pl, 5)]

    ag_id, ag_type, ag_state, ag_role = [], [], [], []
    for a in range(n_ag):
        ag_id.append(100 + a)
        ag_type.append(int(rng.integers(0, 3)))
        ag_role.append([a == 0, a == 2, a in (0, 1)])
        pos = rng.uniform(-60, 60, 2)
        yaw = rng.uniform(-np.pi, np.pi)
        spd = rng.uniform(0, 12)
        t0 = 0 if a < n_ag - 3 else int(rng.integers(5, 30))
        t1 = n_step if a != n_ag - 1 else 60
        gap = (40, 45) if a == 1 else None  # validity hole -> interpolation path
        states = []
        for t in range(n_step):
            valid = (t0 <= t < t1) and not (gap and gap[0] <= t < gap[1])
            vx, vy = spd * np.cos(yaw), spd * np.sin(yaw)
            states.append([pos[0], pos[1], 0.0, 4.5, 2.0, 1.5, yaw, vx, vy, float(valid)])
            pos = pos + np.array([vx, vy]) * 0.1
            yaw += float(rng.uniform(-0.02, 0.02))
            spd = max(0.0, spd + float(rng.uniform(-0.2, 0.2)))
        ag_state.append(states)

    tl_lane_state, tl_lane_id, tl_stop_point = [], [], []
    for t in range(n_step):
        n_tl = 3 if t < 50 else 2  # a light disappears mid-episode
        tl_lane_state.append([int((t // 10 + j) % N_TL_STATE) for j in range(n_tl)])
        tl_lane_id.append([3 + j for j in range(n_tl)])
        tl_stop_point.append([[1.0 * j, 2.0 + j, 0.0] for j in range(n_tl)])

    return dict(
        mp_id=mp_id, mp_xyz=mp_xyz, mp_type=mp_type, mp_edge=mp_edge,
        ag_id=ag_id, ag_type=ag_type, ag_state=ag_state, ag_role=ag_role,
        tl_lane_state=tl_lane_state, tl_lane_id=tl_lane_id, tl_stop_point=tl_stop_point,
    )


def run_pipeline(mod, raw, dataset: str = "training", is_ref: bool = False, seed: int = 0):
    """Drive `mod` (ours or the reference pack_h5) through the packer CLI call
    sequence; returns the reduced episode dict plus __center/__yaw."""
    np.random.seed(seed)  # aligns the dest-selection draws on both sides
    pack_all = "training" in dataset or "validation" in dataset
    pack_history = "validation" in dataset or "testing" in dataset

    episode = {}
    mod.pack_episode_map(episode, raw["mp_id"], raw["mp_xyz"], raw["mp_type"], raw["mp_edge"],
                         N_MP_DATA, N_MP_PL_NODE)
    mod.pack_episode_traffic_lights(
        episode, STEP_CURRENT, raw["tl_lane_state"], raw["tl_lane_id"], raw["tl_stop_point"],
        pack_all, pack_history, N_TL_DATA)
    mod.pack_episode_agents(
        episode, STEP_CURRENT, raw["ag_id"], raw["ag_type"], raw["ag_state"], raw["ag_role"],
        pack_all, pack_history, N_AG_DATA, 3)
    if is_ref:
        center, yaw = mod.center_at_sdc(episode, STEP_CURRENT, -1, -1)
    else:
        center, yaw = mod.center_at_sdc(episode, STEP_CURRENT, -1, -1, np.random)

    reduced = {}
    mod.filter_episode_map(episode, STEP_CURRENT, N_MP_H5, DIST_THRESH_MP, thresh_z=6)
    with_map = bool(episode["map/valid"].any(1).sum() > 0)
    mod.repack_episode_map(episode, reduced, N_MP_H5, N_MP_TYPE)
    mod.filter_episode_traffic_lights(episode)
    mod.repack_episode_traffic_lights(episode, reduced, N_TL_LANE_H5, N_TL_STATE)

    if "training" in dataset:
        mask_sim, mask_no_sim = mod.filter_episode_agents(
            episode, reduced, STEP_CURRENT, N_AG_H5_SIM, DIST_THRESH_AG, DIM_VEH_LANES)
        _repack(mod, is_ref, episode, reduced, mask_sim)
    elif "validation" in dataset:
        mask_sim, mask_no_sim = mod.filter_episode_agents(
            episode, reduced, STEP_CURRENT, N_AG_H5_SIM, DIST_THRESH_AG, DIM_VEH_LANES,
            prefix="history/")
        _repack(mod, is_ref, episode, reduced, mask_sim)
        mod.repack_episode_agents(episode, reduced, mask_sim, N_AG_H5_SIM, prefix="history/")
        mod.repack_episode_agents_no_sim(episode, reduced, mask_no_sim, N_AG_H5_NO_SIM, "")
        mod.repack_episode_agents_no_sim(episode, reduced, mask_no_sim, N_AG_H5_NO_SIM, "history/")
    else:
        raise ValueError(dataset)

    if with_map:
        reduced["map/boundary"] = mod.get_map_boundary(reduced["map/valid"], reduced["map/pos"])
    else:
        reduced["map/boundary"] = mod.get_map_boundary(
            episode["history/agent/valid"], episode["history/agent/pos"])
    reduced["__center"] = np.asarray(center, np.float64)
    reduced["__yaw"] = np.float64(yaw)
    return reduced


def _repack(mod, is_ref, episode, reduced, mask_sim):
    if is_ref:
        mod.repack_episode_agents(
            episode, reduced, mask_sim, N_AG_H5_SIM,
            DIM_VEH_LANES, DIM_CYC_LANES, DIM_PED_LANES, dest_no_pred=False)
    else:
        mod.repack_episode_agents(
            episode, reduced, mask_sim, N_AG_H5_SIM,
            DIM_VEH_LANES, DIM_CYC_LANES, DIM_PED_LANES, False, rng=np.random)
