"""WOSAC realism metrics.

Parity target: /root/reference/src/models/metrics/wosac.py — a host-side
multiprocessing pool over scenarios calling Waymo's official
`compute_scenario_metrics_for_bundle` with the 2024 challenge config, then
aggregation into realism-metametric buckets. The official path is preserved
verbatim behind a gated import; `native_wosac_stats` provides package-free
distributional statistics (kinematic histograms + collision/offroad rates)
for monitoring when waymo_open_dataset is unavailable.
"""

from __future__ import annotations

import itertools
import multiprocessing as mp
import os
from typing import Dict, List, Optional

import numpy as np

FIELD_NAMES = [
    "metametric",
    "average_displacement_error",
    "linear_speed_likelihood",
    "linear_acceleration_likelihood",
    "angular_speed_likelihood",
    "angular_acceleration_likelihood",
    "distance_to_nearest_object_likelihood",
    "collision_indication_likelihood",
    "time_to_collision_likelihood",
    "distance_to_road_edge_likelihood",
    "offroad_indication_likelihood",
    "min_average_displacement_error",
]


def load_official_config():
    from pathlib import Path

    import waymo_open_dataset.wdl_limited.sim_agents_metrics.metrics as wosac_metrics
    from google.protobuf import text_format
    from waymo_open_dataset.protos import sim_agents_metrics_pb2

    config_path = Path(wosac_metrics.__file__).parent / "challenge_2024_config.textproto"
    config = sim_agents_metrics_pb2.SimAgentMetricsConfig()
    text_format.Parse(config_path.read_text(), config)
    return config


def _compute_one(config, scenario_hex: str, rollout):
    import waymo_open_dataset.wdl_limited.sim_agents_metrics.metrics as wosac_metrics
    from waymo_open_dataset.protos import scenario_pb2

    return wosac_metrics.compute_scenario_metrics_for_bundle(
        config, scenario_pb2.Scenario.FromString(bytes.fromhex(scenario_hex)), rollout
    )


class WOSACMetrics:
    """Accumulate official per-scenario metrics over a CPU pool (wosac.py:17-97)."""

    def __init__(self, prefix: str):
        self.prefix = prefix
        self.config = load_official_config()
        self.sums = {k: 0.0 for k in FIELD_NAMES}
        self.counter = 0

    def update(self, scenario_rollouts: List, scenario_bytes: List[str]):
        n_pool = min(len(scenario_rollouts), int(os.getenv("SLURM_CPUS_PER_TASK", os.cpu_count() or 1)))
        ctx = mp.get_context("forkserver")
        with ctx.Pool(processes=n_pool) as pool:
            results = pool.starmap(
                _compute_one, zip(itertools.repeat(self.config), scenario_bytes, scenario_rollouts)
            )
        for m in results:
            self.counter += 1
            for k in FIELD_NAMES:
                self.sums[k] += getattr(m, k)

    def compute(self) -> Dict[str, float]:
        import waymo_open_dataset.wdl_limited.sim_agents_metrics.metrics as wosac_metrics
        from waymo_open_dataset.protos import sim_agents_metrics_pb2

        mean = {k: v / max(self.counter, 1) for k, v in self.sums.items()}
        buckets = wosac_metrics.aggregate_metrics_to_buckets(
            self.config, sim_agents_metrics_pb2.SimAgentMetrics(scenario_id="", **mean)
        )
        out = {
            f"{self.prefix}/wosac/realism_meta_metric": buckets.realism_meta_metric,
            f"{self.prefix}/wosac/kinematic_metrics": buckets.kinematic_metrics,
            f"{self.prefix}/wosac/interactive_metrics": buckets.interactive_metrics,
            f"{self.prefix}/wosac/map_based_metrics": buckets.map_based_metrics,
            f"{self.prefix}/wosac/min_ade": buckets.min_ade,
        }
        for k in FIELD_NAMES:
            out[f"{self.prefix}/wosac_likelihood/{k}"] = mean[k]
        return out


def native_wosac_stats(
    trajs: np.ndarray,  # [n_sc, K, n_ag, n_step, 3] simulated futures
    gt_pose: np.ndarray,  # [n_sc, n_ag, n_step_gt, 3] GT (absolute steps)
    gt_valid: np.ndarray,  # [n_sc, n_ag, n_step_gt]
    valid: np.ndarray,  # [n_sc, n_ag] simulated-agent validity
    collided: Optional[np.ndarray] = None,  # [n_sc, K, n_ag] WOSAC collision flags
    offroad: Optional[np.ndarray] = None,  # [n_sc, K, n_ag]
    step_current: int = 10,
    dt: float = 0.1,
) -> Dict[str, float]:
    """Package-free realism monitoring: ADE/minADE vs GT + kinematic stats +
    collision/offroad rates. Not the official likelihood metametric."""
    n_step = trajs.shape[3]
    gt = gt_pose[:, :, step_current + 1 : step_current + 1 + n_step]
    gv = gt_valid[:, :, step_current + 1 : step_current + 1 + n_step]
    mask = valid[:, None, :, None] & gv[:, None]
    dist = np.linalg.norm(trajs[..., :2] - gt[:, None, ..., :2], axis=-1)
    dist = np.where(mask, dist, 0.0)
    cnt = np.maximum(mask.sum(-1), 1)
    ade_k = dist.sum(-1) / cnt  # [n_sc, K, n_ag]
    ag_mask = valid[:, None, :] & gv.any(-1)[:, None]
    ade = float((ade_k * ag_mask).sum() / max(ag_mask.sum(), 1))
    min_ade = float(
        (np.where(ag_mask, ade_k, np.inf).min(1) * ag_mask.any(1)).sum() / max(ag_mask.any(1).sum(), 1)
    )

    spd = np.linalg.norm(np.diff(trajs[..., :2], axis=3), axis=-1) / dt
    out = {
        "native_wosac/ade": ade,
        "native_wosac/min_ade": min_ade,
        "native_wosac/mean_speed": float(spd.mean()),
        "native_wosac/max_speed": float(spd.max()),
    }
    if collided is not None:
        out["native_wosac/collision_rate"] = float(
            (collided & valid[:, None]).sum() / max(valid.sum() * collided.shape[1], 1)
        )
    if offroad is not None:
        out["native_wosac/offroad_rate"] = float(
            (offroad & valid[:, None]).sum() / max(valid.sum() * offroad.shape[1], 1)
        )
    return out
