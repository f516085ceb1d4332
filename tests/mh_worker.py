"""Worker for tests/test_multiprocess_integration.py — one REAL jax process
of a 2-process x 2-CPU-device "pod". Not collected by pytest (no test_ prefix).

Exercises the full multi-host story end-to-end: jax.distributed init, sharded
loaders (DistributedSampler semantics), fit() on the global 4-device mesh with
put_global batch assembly and barrier-fenced rank-0 checkpointing, then
validate() on the host-LOCAL mesh with the cross-host metric sum.

Usage: python mh_worker.py <proc_id> <port> <ckpt_dir> [full|place]

"place" mode only exercises the cross-process array-placement primitives
(fast, no model compile): put_global batch assembly, fsdp-sharded ->
host-local-replicated put_replicated, and the cross-host sum.
"""

import json
import os
import sys

proc_id, port, ckpt_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
mode = sys.argv[4] if len(sys.argv) > 4 else "full"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=proc_id)
assert jax.process_count() == 2 and len(jax.devices()) == 4, (
    jax.process_count(), len(jax.devices()))

if mode == "place":
    import numpy as np

    from trafficbotsv15_tpu.eval.runner import _cross_host_sum
    from trafficbotsv15_tpu.parallel.mesh import (
        batch_sharding, fsdp_shard_params, make_mesh, put_global, put_replicated, replicated)

    gmesh = make_mesh()  # 4 devices, process-spanning
    # sharded global batch from per-process rows (each rank holds 2 of 4 rows)
    local = np.arange(8, dtype=np.float32).reshape(2, 4) + 100 * proc_id
    g = put_global(local, batch_sharding(gmesh))
    total = float(jax.jit(lambda x: x.sum(), out_shardings=replicated(gmesh))(g))
    # fsdp-sharded (non-addressable, non-replicated) params -> host-local mesh
    params = {"w": np.arange(16, dtype=np.float32).reshape(4, 4), "b": np.ones(4, np.float32)}
    sharded = fsdp_shard_params(params, gmesh, min_size=1)
    assert not sharded["w"].is_fully_addressable and not sharded["w"].is_fully_replicated
    lmesh = make_mesh(devices=jax.local_devices())
    out = jax.tree_util.tree_map(lambda x: put_replicated(x, replicated(lmesh)), sharded)
    np.testing.assert_array_equal(np.asarray(out["w"]), params["w"])
    reduced = _cross_host_sum({"a": np.asarray(float(proc_id + 1))})
    print("MHRESULT " + json.dumps({
        "proc": proc_id, "batch_sum": total, "cross_sum": float(reduced["a"]),
    }), flush=True)
    sys.exit(0)

from trafficbotsv15_tpu import run as run_mod  # noqa: E402
from trafficbotsv15_tpu.config import tiny_config  # noqa: E402
from trafficbotsv15_tpu.eval.runner import validate  # noqa: E402

cfg = run_mod.apply_overrides(tiny_config(), {"validate_every_epoch": False, "max_epochs": 1})

train_loader, val_loader = run_mod.make_dataloaders(cfg, "synthetic", None)
params, _, stopped = run_mod.fit(cfg, train_loader, val_loader, ckpt_dir=ckpt_dir,
                                 max_steps=2, log_every=1)
assert not stopped

metrics = validate(cfg, val_loader, ckpt_dir=ckpt_dir, params=params, max_batches=2)
out = {k: round(float(v), 6) for k, v in metrics.items() if "per_sec" not in k}

# submission assembly across processes: each rank generates DIFFERENT
# scenarios; _allgather_host_rows must hand rank 0 all of them
from pathlib import Path  # noqa: E402

sys.path.insert(0, str(Path(__file__).parent))
import waymo_stub  # noqa: E402

waymo_stub.install()
from trafficbotsv15_tpu.data.synthetic import make_batch  # noqa: E402
from trafficbotsv15_tpu.eval.runner import test_submission  # noqa: E402

sub_dir = os.path.join(ckpt_dir, "sub")
loader = [make_batch(cfg.data, n_sc=2, seed=100 + proc_id, test_mode=True)]
res = test_submission(cfg, loader, params, out_dir=sub_dir, n_joint_future=4)
sub_sids = None
if jax.process_index() == 0:
    from waymo_open_dataset.protos import motion_submission_pb2 as mpb  # noqa: E402

    womd_bin = next(Path(sub_dir).glob("*_WOMD/*_WOMD.bin"))
    msg = mpb.MotionChallengeSubmission.FromString(womd_bin.read_bytes())
    sub_sids = sorted(p.scenario_id for p in msg.scenario_predictions)

print("MHRESULT " + json.dumps({
    "proc": proc_id, "metrics": out, "sub_sids": sub_sids,
    "sub_skipped": res == (None, None),
}), flush=True)
