"""Smoke tests for the cv2 visualization (map raster, rollout video, dest heatmap)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from trafficbotsv15_tpu.config import DataCfg
from trafficbotsv15_tpu.data.synthetic import make_batch
from trafficbotsv15_tpu.utils.visualization import (
    SceneRenderer,
    dest_prob_image,
    get_dest_prob_images,
    save_prediction_videos,
    save_rollout_video,
)


@pytest.fixture(scope="module")
def scene():
    cfg = DataCfg(n_ag=8, n_mp=16, n_step=15, n_tl_lane=8, n_tl_stop=8)
    return make_batch(cfg, n_sc=1, seed=2)


def test_scene_renderer(scene):
    b = scene
    r = SceneRenderer(b["map/valid"][0], b["map/type"][0], b["map/pos"][0], b["map/boundary"][0])
    img = r.draw_step(
        b["agent/pos"][0, :, 5, :3].copy(), b["agent/valid"][0, :, 5], b["agent/size"][0],
        ag_role=b["agent/role"][0],
    )
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.sum() > 0  # something was drawn


def test_rollout_video(scene, tmp_path):
    b = scene
    pose = np.concatenate([b["agent/pos"][0, :, :, :2], b["agent/yaw_bbox"][0]], axis=-1)
    path = save_rollout_video(
        str(tmp_path / "rollout.mp4"),
        b["map/valid"][0], b["map/type"][0], b["map/pos"][0], b["map/boundary"][0],
        pred_pose=pose, pred_valid=b["agent/valid"][0], ag_size=b["agent/size"][0],
        ag_role=b["agent/role"][0],
    )
    import os

    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_dest_prob_image(scene):
    b = scene
    probs = np.random.default_rng(0).random(16)
    probs /= probs.sum()
    img = dest_prob_image(b["map/valid"][0], b["map/type"][0], b["map/pos"][0],
                          b["map/boundary"][0], probs, agent_pose=b["agent/pos"][0, 0, 0, :3])
    assert img.sum() > 0


def _episode(b, i=0):
    ep = {k: np.asarray(v)[i] for k, v in b.items()
          if k.startswith(("map/", "agent/", "tl_lane/", "tl_stop/")) and not isinstance(v, list)}
    return ep


@pytest.mark.slow
def test_prediction_videos_full_parity(scene, tmp_path):
    """gt/pd/mix videos + agent-centric views with violation/action text
    sidebar + TL rendering (vis_waymo.py:177-518 parity surface)."""
    b = scene
    ep = _episode(b)
    n_ag, n_step = ep["agent/valid"].shape[:2]
    step_current = 4
    n_fut = n_step - step_current - 1
    rng = np.random.default_rng(0)
    pred = {
        "step_current": step_current, "step_gt": n_step - 1, "step_end": n_step - 1,
        "agent/valid": ep["agent/valid"][:, step_current + 1:],
        "agent/pos": ep["agent/pos"][:, step_current + 1:, :2] + 0.5,
        "agent/yaw_bbox": ep["agent/yaw_bbox"][:, step_current + 1:],
        "tl_lane/state": np.asarray(b["tl_lane/state"])[0, :, step_current + 1:],
        "tl_stop/state": np.asarray(b["tl_stop/state"])[0, :, step_current + 1:],
        "ag_navi_valid": np.ones((n_ag, n_fut), bool),
        "action": rng.normal(size=(n_ag, n_fut, 2)).astype(np.float32),
        "act_P": rng.normal(size=(n_ag, n_fut)).astype(np.float32),
        "score": rng.normal(size=(n_ag,)).astype(np.float32),
        "diffbar_reward": rng.normal(size=(n_ag, n_fut)).astype(np.float32),
    }
    for key in ("outside_map", "collided", "run_red_light", "run_road_edge",
                "passive", "goal_reached", "dest_reached", "collided_wosac"):
        pred[f"{key}_this_step"] = rng.random((n_ag, n_fut)) < 0.1
        pred[key] = pred[f"{key}_this_step"].cumsum(-1) > 0
    paths = save_prediction_videos(str(tmp_path / "ep0"), ep, pred)
    # gt + pd + mix + sdc view + predict-role views + up to 5 others
    import os

    names = {os.path.basename(p) for p in paths}
    assert any("gt" in n for n in names)
    assert any("pd" in n for n in names)
    assert any("mix" in n for n in names)
    assert any("sdc" in n for n in names)
    for p in paths:
        assert os.path.exists(p) and (os.path.isdir(p) or os.path.getsize(p) > 0)


def test_tl_rendering_changes_frame(scene):
    """Lane-type styling + TL states actually change pixels."""
    b = scene
    ep = _episode(b)
    r = SceneRenderer(ep["map/valid"], ep["map/type"], ep["map/pos"], ep["map/boundary"])
    plain = r.base.copy()
    lit = r.draw_tl(
        r.base.copy(),
        tl_lane_valid=ep["tl_lane/valid"][:, 0], tl_lane_state=ep["tl_lane/state"][:, 0],
        tl_lane_idx=ep["tl_lane/idx"],
        tl_stop_valid=ep["tl_stop/valid"][:, 0], tl_stop_state=ep["tl_stop/state"][:, 0],
        tl_stop_pos=ep["tl_stop/pos"], tl_stop_dir=ep["tl_stop/dir"],
    )
    if ep["tl_lane/valid"][:, 0].any() or ep["tl_stop/valid"][:, 0].any():
        assert (lit != plain).any()


def test_dest_prob_images_per_role(scene, tmp_path):
    b = scene
    ep = _episode(b)
    n_ag, n_mp = ep["agent/valid"].shape[0], ep["map/valid"].shape[0]
    probs = np.random.default_rng(1).random((n_ag, n_mp))
    probs /= probs.sum(-1, keepdims=True)
    paths = get_dest_prob_images(str(tmp_path / "dest"), ep, probs)
    import os

    assert len(paths) >= 1
    for p in paths:
        assert os.path.getsize(p) > 0
    # gt-dest overlay path exercised (agent/dest exists in the synthetic batch)
    img = cv2.imread(paths[0])
    assert img is not None and img.sum() > 0
