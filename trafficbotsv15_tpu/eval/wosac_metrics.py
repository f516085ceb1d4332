"""WOSAC realism metrics.

Parity target: /root/reference/src/models/metrics/wosac.py — a host-side
multiprocessing pool over scenarios calling Waymo's official
`compute_scenario_metrics_for_bundle` with the 2024 challenge config, then
aggregation into realism-metametric buckets. The official path is preserved
verbatim behind a gated import; when waymo_open_dataset is unavailable the
package-free realism metametric (eval/wosac_likelihood.py, wired into the
jitted validate step) reports the same likelihood fields on-device.
"""

from __future__ import annotations

import itertools
import multiprocessing as mp
import os
from typing import Dict, List

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
