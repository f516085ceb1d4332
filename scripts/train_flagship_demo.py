"""Short flagship training demo on the local TPU: N steps on one synthetic
batch, logging the loss trajectory to docs/flagship_train_log.json.

Demonstrates the full 10M-param training step (90-step BPTT + AdamW) running
on real hardware with a decreasing loss.
"""

import json
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
from trafficbotsv15_tpu.train.optimizer import make_optimizer
from trafficbotsv15_tpu.train.pipeline import build_model, init_params, make_train_step


def main(n_steps: int = 12, n_sc: int = 8):
    cfg = leaderboard_config()
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg.data, n_sc=n_sc, seed=0).items()}
    model = build_model(cfg)
    params = init_params(cfg, model, batch, jax.random.PRNGKey(0))
    opt = make_optimizer(cfg.optimizer, steps_per_epoch=1000)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(cfg, model, opt), donate_argnums=(0, 1))

    log = []
    key = jax.random.PRNGKey(1)
    for i in range(n_steps):
        t0 = time.perf_counter()
        params, opt_state, m = step(params, opt_state, batch, jax.random.fold_in(key, i), 0)
        loss = float(m["training/loss"])
        dt = time.perf_counter() - t0
        rec = {"step": i, "loss": round(loss, 4), "sec": round(dt, 2),
               **{k: round(float(v), 4) for k, v in m.items() if k != "training/loss"}}
        log.append(rec)
        print(rec, flush=True)

    out = Path(__file__).resolve().parents[1] / "docs" / "flagship_train_log.json"
    out.write_text(json.dumps({"config": "leaderboard 10M", "batch": n_sc, "log": log}, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12)
