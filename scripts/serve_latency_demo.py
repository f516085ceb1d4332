"""Interactive serving latency on the local TPU: per-step wall time of the
InteractiveSimulator (1 scenario, 64 agents, flagship 10M policy)."""

import os
import sys
import time
from pathlib import Path

sys.path.append(str(Path(__file__).resolve().parents[1]))
if os.environ.get("JAX_PLATFORMS") in ("axon", "tpu"):
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"
import jax
from trafficbotsv15_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache(jax)
import jax.numpy as jnp
from trafficbotsv15_tpu.config import leaderboard_config
from trafficbotsv15_tpu.data.synthetic import make_batch
from trafficbotsv15_tpu.serve import InteractiveSimulator
from trafficbotsv15_tpu.train.pipeline import build_model, init_params

cfg = leaderboard_config()
batch = {k: jnp.asarray(v) for k, v in make_batch(cfg.data, n_sc=1, seed=0).items()}
params = init_params(cfg, build_model(cfg), batch, jax.random.PRNGKey(0))
sim = InteractiveSimulator(cfg, params)
obs = sim.reset(batch, jax.random.PRNGKey(1))
for _ in range(3):
    out = sim.step()  # warmup + compile
t0 = time.perf_counter()
N = 50
for _ in range(N):
    out = sim.step()
lat = (time.perf_counter() - t0) / N * 1e3
print(f"interactive step latency (1 scenario, 64 agents, flagship 10M, v5e): {lat:.2f} ms -> {1000/lat:.0f} steps/s")

t0 = time.perf_counter()
for _ in range(N):
    out = sim.step(fetch=False)
jax.block_until_ready(out["pose"])
lat2 = (time.perf_counter() - t0) / N * 1e3
print(f"fetch=False (async, device-resident): {lat2:.2f} ms/step")
