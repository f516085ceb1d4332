"""TEST STUB of waymo_open_dataset.wdl_limited.sim_agents_metrics.metrics.

Exercises OUR pool/aggregation machinery (eval/wosac_metrics.py::WOSACMetrics)
without the waymo package; the per-scenario 'metrics' here are deterministic
functions of the rollout structure, NOT Waymo's likelihood math."""

from waymo_open_dataset.protos import sim_agents_metrics_pb2 as pb

_FLOAT_FIELDS = [
    "metametric",
    "average_displacement_error",
    "min_average_displacement_error",
    "linear_speed_likelihood",
    "linear_acceleration_likelihood",
    "angular_speed_likelihood",
    "angular_acceleration_likelihood",
    "distance_to_nearest_object_likelihood",
    "collision_indication_likelihood",
    "time_to_collision_likelihood",
    "distance_to_road_edge_likelihood",
    "offroad_indication_likelihood",
]


def compute_scenario_metrics_for_bundle(config, scenario, rollout):
    m = pb.SimAgentMetrics()
    m.scenario_id = rollout.scenario_id
    n_scene = len(rollout.joint_scenes)
    n_traj = len(rollout.joint_scenes[0].simulated_trajectories) if n_scene else 0
    for i, f in enumerate(_FLOAT_FIELDS):
        setattr(m, f, 0.1 * (i + 1) + 0.001 * n_scene + 0.0001 * n_traj)
    return m


class _Buckets:
    def __init__(self, m):
        self.realism_meta_metric = m.metametric
        self.kinematic_metrics = 0.25 * (
            m.linear_speed_likelihood + m.linear_acceleration_likelihood
            + m.angular_speed_likelihood + m.angular_acceleration_likelihood)
        self.interactive_metrics = (
            m.distance_to_nearest_object_likelihood + m.collision_indication_likelihood
            + m.time_to_collision_likelihood) / 3.0
        self.map_based_metrics = 0.5 * (
            m.distance_to_road_edge_likelihood + m.offroad_indication_likelihood)
        self.min_ade = m.min_average_displacement_error


def aggregate_metrics_to_buckets(config, metrics):
    return _Buckets(metrics)
