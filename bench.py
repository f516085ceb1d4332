"""Benchmark: agent-steps/sec/chip in the 80-step closed-loop WOSAC rollout.

Workload = BASELINE config #3: the flagship 10M-param model rolling out
n_joint_future parallel futures per scenario for 80 steps at 10 Hz with 64
agents — the reference's WOSAC validation inner loop
(waymo_motion.py:439-524, 32 futures).

Baseline: the reference validates 44,097 WOMD scenarios in ~2.5 days on
4x RTX 4090 (README.md:45) => ~0.051 scenarios/s/GPU, i.e.
0.051 * 80 steps * 64 agents * 32 futures ~= 8.4e3 agent-steps/s/chip.
That number includes metric computation, so it is a favorable-to-the-reference
lower bound on its rollout speed; vs_baseline reported here uses it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

# keep the CPU backend available so parameter init traces locally (fast)
# instead of through the remote TPU compiler
if os.environ.get("JAX_PLATFORMS") in ("axon", "tpu"):
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"

import jax

# persistent compilation cache: the flagship rollout graph is large and the
# axon remote compiler is slow; cache hits make repeated bench runs start fast
jax.config.update("jax_compilation_cache_dir", os.path.expanduser(f"~/.cache/jax_tb_tpu_{__import__('platform').node()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

if os.environ.get("BENCH_RBG") == "1":
    # cheap TPU-native PRNG for dropout/sampling (threefry replay under full
    # remat costs a forward's worth of hashing per backward step)
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")

import jax.numpy as jnp

BASELINE_AGENT_STEPS_PER_SEC_PER_CHIP = 8.4e3
# training baseline: 1.2 effective WOMD epochs (~584k samples) in ~5 days on
# 4 GPUs (README.md:45,55) => ~1.35 samples/s over 4 chips = 0.34 samples/s/chip
BASELINE_TRAIN_SAMPLES_PER_SEC_PER_CHIP = 0.34


def bench_train(cfg, model, params, batch, n_iters):
    """Full training step (forward + 90-step BPTT rollout + AdamW) throughput."""
    from trafficbotsv15_tpu.train.optimizer import make_optimizer
    from trafficbotsv15_tpu.train.pipeline import make_train_step

    opt = make_optimizer(cfg.optimizer, steps_per_epoch=1000)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(cfg, model, opt), donate_argnums=(0, 1))
    key = jax.random.PRNGKey(1)
    # two warmup calls: the first compiles; the second absorbs a one-time
    # ~minutes runtime stall observed after compiling very large executables
    # on this image (device fully idle during it — profiler-verified), so it
    # must not leak into the timed loop
    for w in range(2):
        params, opt_state, m = step(params, opt_state, batch, jax.random.fold_in(key, 1000 + w), 0)
        jax.block_until_ready(m["training/loss"])
    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t0 = time.perf_counter()
    for i in range(n_iters):
        params, opt_state, m = step(params, opt_state, batch, jax.random.fold_in(key, i), 0)
    jax.block_until_ready(m["training/loss"])
    dt = (time.perf_counter() - t0) / n_iters
    if profile_dir:
        jax.profiler.stop_trace()
    return dt


def main():
    from trafficbotsv15_tpu.config import leaderboard_config
    from trafficbotsv15_tpu.data.synthetic import make_batch
    from trafficbotsv15_tpu.train.evaluation import joint_future_pred
    from trafficbotsv15_tpu.train.pipeline import build_model, init_params

    mode = os.environ.get("BENCH_MODE", "rollout")
    # rollout default batch 4: the throughput sweet spot on v5e (batch 2 leaves
    # fixed per-step costs unamortized, batch 8 pressures HBM; docs/PERF.md)
    n_sc = int(os.environ.get("BENCH_N_SC", "8" if mode == "train" else "4"))
    n_future = int(os.environ.get("BENCH_N_FUTURE", "32"))
    n_iters = int(os.environ.get("BENCH_ITERS", "5"))
    check_level = int(os.environ.get("BENCH_CHECK_LEVEL", "1"))

    cfg = leaderboard_config()
    import dataclasses

    if os.environ.get("BENCH_REMAT"):  # full | dots | none
        cfg = dataclasses.replace(cfg, remat_policy=os.environ["BENCH_REMAT"])
    if os.environ.get("BENCH_USE_PALLAS") == "1":
        m = cfg.model
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            m, tf_cfg=dataclasses.replace(m.tf_cfg, use_pallas=True)))
    if os.environ.get("BENCH_DROPOUT0") == "1":
        m = cfg.model
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            m, tf_cfg=dataclasses.replace(m.tf_cfg, dropout_p=0.0)))
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg.data, n_sc=n_sc, seed=0).items()}
    model = build_model(cfg)
    params = init_params(cfg, model, batch, jax.random.PRNGKey(0))

    if mode == "train":
        dt = bench_train(cfg, model, params, batch, n_iters)
        n_chips = len([d for d in jax.devices() if d.platform != "cpu"]) or 1
        value = n_sc / dt / n_chips
        print(json.dumps({
            "metric": "train_samples_per_sec_per_chip",
            "value": round(value, 3),
            "unit": "samples/s/chip",
            "vs_baseline": round(value / BASELINE_TRAIN_SAMPLES_PER_SEC_PER_CHIP, 2),
        }))
        return

    def run(params, batch, key):
        _, buf = joint_future_pred(cfg, model, params, batch, key,
                                   n_joint_future=n_future, check_level=check_level)
        # reduce outputs so only scalars come back to host
        return jnp.sum(buf.pred_pose), jnp.sum(buf.violation["collided_wosac"])

    run_jit = jax.jit(run)
    key = jax.random.PRNGKey(1)

    # warmup / compile (twice: second call absorbs the one-time post-compile
    # runtime stall seen with large executables on this image)
    jax.block_until_ready(run_jit(params, batch, key))
    jax.block_until_ready(run_jit(params, batch, jax.random.fold_in(key, 999)))

    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = run_jit(params, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters
    if profile_dir:
        jax.profiler.stop_trace()

    n_steps = cfg.time_step_end - cfg.time_step_current  # 80 future steps
    agent_steps = n_sc * n_future * cfg.data.n_ag * n_steps
    n_chips = len([d for d in jax.devices() if d.platform != "cpu"]) or 1
    value = agent_steps / dt / n_chips

    print(json.dumps({
        "metric": "wosac_rollout_agent_steps_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "agent-steps/s/chip",
        "vs_baseline": round(value / BASELINE_AGENT_STEPS_PER_SEC_PER_CHIP, 2),
    }))


if __name__ == "__main__":
    main()
