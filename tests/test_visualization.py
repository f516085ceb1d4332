"""Smoke tests for the cv2 visualization (map raster, rollout video, dest heatmap)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from trafficbotsv15_tpu.config import DataCfg
from trafficbotsv15_tpu.data.synthetic import make_batch
from trafficbotsv15_tpu.utils.visualization import SceneRenderer, save_rollout_video, dest_prob_image


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
