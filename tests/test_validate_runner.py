"""End-to-end validate runner on the tiny config + synthetic loader."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trafficbotsv15_tpu.config import tiny_config
from trafficbotsv15_tpu.data.synthetic import make_batch
from trafficbotsv15_tpu.eval.runner import validate
from trafficbotsv15_tpu.train.pipeline import build_model, init_params


class Loader:
    def __init__(self, cfg, n_batches=2, n_sc=2):
        self.cfg, self.n_batches, self.n_sc = cfg, n_batches, n_sc

    def __iter__(self):
        for i in range(self.n_batches):
            yield make_batch(self.cfg.data, n_sc=self.n_sc, seed=100 + i)


@pytest.mark.slow
def test_validate_end_to_end():
    cfg = tiny_config(n_ag=6, n_mp=20, n_tl=6, n_step=21, hidden_dim=32)
    loader = Loader(cfg)
    batch0 = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
    model = build_model(cfg)
    params = init_params(cfg, model, batch0, jax.random.PRNGKey(0))

    metrics = validate(cfg, loader, params=params)
    assert np.isfinite(metrics["val/loss"])
    assert "reactive_replay/err/pos_meter" in metrics
    assert "joint_future_pred/traffic_rule/collided" in metrics
    assert "joint_future_pred/womd/min_ade" in metrics
    assert np.isfinite(metrics["joint_future_pred/womd/min_ade"])
    assert metrics["val/scenarios_per_sec"] > 0
    # native WOSAC realism is reported end-to-end without the waymo package
    # (reference: every-epoch official WOSAC metric, wosac.py:79-97)
    assert 0.0 < metrics["wosac/realism_meta_metric"] <= 1.0
    for bucket in ("kinematic_metrics", "interactive_metrics", "map_based_metrics"):
        assert 0.0 < metrics[f"wosac/{bucket}"] <= 1.0
    for field in (
        "linear_speed_likelihood", "linear_acceleration_likelihood",
        "angular_speed_likelihood", "angular_acceleration_likelihood",
        "distance_to_nearest_object_likelihood", "collision_indication_likelihood",
        "time_to_collision_likelihood", "distance_to_road_edge_likelihood",
        "offroad_indication_likelihood", "average_displacement_error",
        "min_average_displacement_error",
    ):
        assert np.isfinite(metrics[f"wosac_likelihood/{field}"]), field
    assert metrics["wosac_likelihood/min_average_displacement_error"] <= \
        metrics["wosac_likelihood/average_displacement_error"] + 1e-6
    assert np.isfinite(metrics["wosac/min_ade"])


@pytest.mark.slow
def test_official_womd_wiring(monkeypatch):
    """The official WOMD op path (gated off on this image — no tf/waymo):
    validate() must accumulate golden-tested packed inputs per batch and make
    ONE epoch-end call with the concatenated rows (the reference's
    dist_reduce_fx="cat" + aggregate_on_cpu idiom, womd.py:114-174)."""
    from trafficbotsv15_tpu.eval import runner as runner_mod
    from trafficbotsv15_tpu.eval import womd_metrics as wm

    cfg = tiny_config(n_ag=6, n_mp=20, n_tl=6, n_step=21, hidden_dim=32)
    loader = Loader(cfg, n_batches=2, n_sc=2)
    batch0 = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
    model = build_model(cfg)
    params = init_params(cfg, model, batch0, jax.random.PRNGKey(0))

    calls = []

    def fake_op(packed, step_current, prefix):
        calls.append((packed, step_current, prefix))
        return {f"{prefix}/waymo_metrics/mean_average_precision": 0.5}

    monkeypatch.setattr(runner_mod, "_womd_official_available", lambda: True)
    monkeypatch.setattr(wm, "official_motion_metrics", fake_op)
    metrics = validate(cfg, loader, params=params)

    assert metrics["joint_future_pred/waymo_metrics/mean_average_precision"] == 0.5
    assert metrics["reactive_replay/waymo_metrics/mean_average_precision"] == 0.5
    # one aggregated call per rollout flavor (waymo_motion.py:569-582,611-646),
    # not one per batch
    assert [c[2] for c in calls] == ["joint_future_pred", "reactive_replay"]
    for packed, step_current, prefix in calls:
        assert step_current == cfg.time_step_current
        # 2 batches x 2 scenarios concatenated; op-layout invariants hold
        assert packed["prediction_trajectory"].shape[0] == 4
        assert packed["ground_truth_trajectory"].shape[-1] == 7
        assert packed["prediction_ground_truth_indices_mask"].any()
    # joint futures carry K modes, reactive replay exactly one
    assert calls[0][0]["prediction_trajectory"].shape[2] > 1
    assert calls[1][0]["prediction_trajectory"].shape[2] == 1
