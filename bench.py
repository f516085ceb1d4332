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
from trafficbotsv15_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache(jax)

if os.environ.get("BENCH_RBG") == "1":
    # cheap TPU-native PRNG for dropout/sampling (threefry replay under full
    # remat costs a forward's worth of hashing per backward step)
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")

import jax.numpy as jnp

BASELINE_AGENT_STEPS_PER_SEC_PER_CHIP = 8.4e3
# training baseline: 1.2 effective WOMD epochs (~584k samples) in ~5 days on
# 4 GPUs (README.md:45,55) => ~1.35 samples/s over 4 chips = 0.34 samples/s/chip
BASELINE_TRAIN_SAMPLES_PER_SEC_PER_CHIP = 0.34
# validation baseline: 44,097 scenarios in ~2.5 days on 4 GPUs (README.md:45)
# = 0.051 scenarios/s/GPU — this one INCLUDES metric computation, which the
# validate mode here also performs (both rollouts + native realism + WOMD)
BASELINE_VALIDATE_SCENARIOS_PER_SEC_PER_CHIP = 0.051

# published peak bf16 matmul throughput per chip, for MFU reporting.
# Substring-matched most-specific-first against the whitespace-stripped
# device_kind; "v5lite" must precede "v5" (a real v5e reports device_kind
# "TPU v5 lite" -> "tpuv5lite", which contains neither "v5e" nor "v5p").
_PEAK_BF16_FLOPS = (
    ("v6e", 918e12), ("v6", 918e12), ("v5p", 459e12), ("v5e", 197e12),
    ("v5lite", 197e12), ("v5", 459e12), ("v4", 275e12), ("v3", 123e12),
)


def _peak_flops() -> float:
    kind = "".join(jax.devices()[0].device_kind.lower().split())
    for name, peak in _PEAK_BF16_FLOPS:
        if name in kind:
            return peak
    return 0.0


def _lowered_flops(fn, *args) -> float:
    """HLO flop count of fn at abstract args (no execution, no backend
    compile). XLA's cost analysis does NOT scale lax.scan bodies by trip
    count, so callers decompose scans by hand (see _rollout_flops). Lowered
    on the CPU client — flops are backend-independent and the TPU plugin's
    cost_analysis returns None."""
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            ca = jax.jit(fn).lower(*args).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _abstract(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype) if hasattr(x, "shape") else x, tree
    )


def _expand_batch(batch, k: int):
    return {
        n: jax.ShapeDtypeStruct((v.shape[0] * k,) + v.shape[1:], v.dtype)
        for n, v in batch.items()
    }


def _flops_cache(key: str, compute):
    """Disk-memoize analytic flop counts (~/.cache/jax_tb_flops.json). The
    counts are pure functions of config + abstract shapes, but the CPU
    lowering that produces them takes minutes on small hosts — cache them so
    only the first bench run per (config, shapes) pays."""
    path = os.path.expanduser("~/.cache/jax_tb_flops.json")
    try:
        with open(path) as f:
            cache = json.load(f)
    except (OSError, ValueError):
        cache = {}
    if key in cache:
        return float(cache[key])
    val = compute()
    if val > 0:
        try:
            # re-read and merge just before writing so a concurrent bench
            # run's entry is not dropped by last-writer-wins (ADVICE r3)
            with open(path) as f:
                cache = {**json.load(f), **cache}
        except (OSError, ValueError):
            pass
        cache[key] = val
        try:
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(cache, f)
            os.replace(tmp, path)
        except OSError:
            pass
    return val


def _rollout_flops(cfg, model, params, batch, n_future: int, n_steps: int) -> float:
    """Analytic FLOPs of one closed-loop rollout call: one-time scene encoders
    at the scenario batch + n_steps x the per-step policy at the K-expanded
    batch. Counts the encoder/policy matmul path (latent/navi/dynamics/rule
    checks are excluded — a few % — so MFU reported from this is a floor)."""
    if os.environ.get("BENCH_MFU") == "0":  # skip the ~minutes of CPU lowering
        return 0.0
    import dataclasses as _dc
    import hashlib as _hl

    shapes = sorted((k, tuple(v.shape), str(v.dtype)) for k, v in batch.items())
    # version the memo with the package/jax versions AND the flop-counting
    # source itself, so upgrades or counting changes invalidate stale entries
    # instead of silently mis-reporting MFU (ADVICE r3)
    import inspect as _ins

    import trafficbotsv15_tpu as _pkg

    src = _ins.getsource(_rollout_flops_uncached)
    key = _hl.md5(repr((
        _pkg.__version__, jax.__version__, _hl.md5(src.encode()).hexdigest(),
        _dc.asdict(cfg), shapes, n_future, n_steps,
    )).encode()).hexdigest()
    return _flops_cache(key, lambda: _rollout_flops_uncached(
        cfg, model, params, batch, n_future, n_steps))


def _rollout_flops_uncached(cfg, model, params, batch, n_future: int, n_steps: int) -> float:
    from trafficbotsv15_tpu.data.preprocessing import pre_processing

    W = cfg.model.temp_window_size
    L = cfg.model.latent_encoder.latent_dim

    def _pp(b):
        return pre_processing(b, tl_mode=cfg.model.tl_mode, navi_mode=cfg.model.navi_mode,
                              n_step_hist=cfg.n_step_hist, training=True)

    def enc(params, b):
        pp = _pp(b)
        mp = model.apply({"params": params}, pp.mp_valid, pp.mp_attr, pp.mp_pose, pp.mp_type,
                         method="encode_map")
        tl = model.apply({"params": params}, pp.tl_valid, pp.tl_attr, pp.tl_pose, mp,
                         method="precompute_tl")
        return mp, tl

    def full(params, b, skip_tl=False):
        pp = _pp(b)
        mp, tl = enc(params, b)
        n_sc, n_ag = pp.ag_valid.shape[:2]
        tl_feat = None
        if skip_tl:  # TL pre-pass mode: the scan body consumes a precomputed feature
            tl_feat = jnp.zeros(tl.invalid.shape + (cfg.model.hidden_dim,))
        return model.apply(
            {"params": params},
            ag_valid=pp.ag_valid[:, :, -1],
            hist_ag_valid=pp.ag_valid[:, :, -W:],
            hist_ag_pose=pp.ag_pose[:, :, -W:],
            hist_ag_motion=pp.ag_motion[:, :, -W:],
            hist_tl_state=None if skip_tl else pp.tl_state[:, :, -W:].astype(jnp.float32),
            hist_step_invalid=jnp.zeros(W, bool),
            ag_attr=pp.ag_attr, ag_type=pp.ag_type,
            ag_latent=jnp.zeros((n_sc, n_ag, L)),
            ag_latent_valid=jnp.any(pp.ag_valid, -1),
            ag_navi=pp.gt_navi, ag_navi_valid=jnp.any(pp.gt_valid, -1),
            tl_tokens=tl, mp_tokens=mp, method="step",
            tl_token_feature=tl_feat,
        )

    p_abs, b_abs = _abstract(params), _abstract(batch)
    b_exp = _expand_batch(b_abs, n_future)
    enc_once = _lowered_flops(enc, p_abs, b_abs)
    # mirror the callers' gating exactly (ADVICE r4 #3): joint-future
    # (n_future > 1) uses tl_rollout_scan unconditionally; the train/replay
    # regimes (n_future == 1) additionally require the GT TL horizon to cover
    # time_step_end + 1 states (train/pipeline.py, train/evaluation.py) —
    # otherwise TL runs in-scan and its flops belong in the per-step term
    prepass_on = cfg.tl_prepass and cfg.model.temp_window_size > 0 and (
        n_future > 1
        or jax.eval_shape(_pp, b_abs).gt_tl_state.shape[2] >= cfg.time_step_end + 1
    )
    if prepass_on:
        # executed-flops model for the hoisted TL subsystem: the policy step
        # runs TL-free on the K-expanded rows; the TL encode runs once per
        # UNIQUE scenario per step (sim/tl_prepass.py), so MFU does not claim
        # the K-1 replica TL computations the hoist eliminated
        step = (_lowered_flops(lambda p, b: full(p, b, True), p_abs, b_exp)
                - _lowered_flops(enc, p_abs, b_exp))
        tl_step = (_lowered_flops(full, p_abs, b_abs)
                   - _lowered_flops(lambda p, b: full(p, b, True), p_abs, b_abs))
        if enc_once <= 0 or step <= 0 or tl_step <= 0:
            return 0.0
        return enc_once + n_steps * (step + tl_step)
    step = _lowered_flops(full, p_abs, b_exp) - _lowered_flops(enc, p_abs, b_exp)
    if enc_once <= 0 or step <= 0:
        return 0.0
    return enc_once + n_steps * step


def _mfu_fields(flops: float, dt: float) -> dict:
    if os.environ.get("BENCH_MFU") == "0":  # skip the flops lowering (sweeps)
        return {}
    peak = _peak_flops()
    out = {}
    if flops > 0:
        # flops is for the whole (global-batch) call; report per-chip like the
        # throughput fields, so MFU stays comparable across device counts
        per_chip = flops / max(len(jax.devices()), 1)
        out["tflops_per_sec"] = round(per_chip / dt / 1e12, 2)
        if peak > 0:
            out["mfu_pct"] = round(100.0 * per_chip / dt / peak, 2)
    return out


def bench_train(cfg, model, params, batch, n_iters):
    """Full training step (forward + 90-step BPTT rollout + AdamW) throughput."""
    from trafficbotsv15_tpu.train.optimizer import make_optimizer
    from trafficbotsv15_tpu.train.pipeline import make_train_step

    opt = make_optimizer(cfg.optimizer, steps_per_epoch=1000)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(1)
    step = jax.jit(make_train_step(cfg, model, opt), donate_argnums=(0, 1)).lower(
        params, opt_state, batch, key, 0
    ).compile()
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
    return dt, step


def main():
    from trafficbotsv15_tpu.config import leaderboard_config
    from trafficbotsv15_tpu.data.synthetic import make_batch
    from trafficbotsv15_tpu.train.evaluation import joint_future_pred
    from trafficbotsv15_tpu.train.pipeline import build_model, init_params

    mode = os.environ.get("BENCH_MODE", "rollout")
    # rollout default batch 4: the throughput sweet spot on v5e (batch 2 leaves
    # fixed per-step costs unamortized, batch 8 pressures HBM; docs/PERF.md)
    n_sc = int(os.environ.get("BENCH_N_SC",
                              {"train": "8", "serve": "1"}.get(mode, "4")))
    n_future = int(os.environ.get("BENCH_N_FUTURE", "32"))
    n_iters = int(os.environ.get("BENCH_ITERS", "5"))
    check_level = int(os.environ.get("BENCH_CHECK_LEVEL", "1"))

    # BENCH_PRESET=scaled: BASELINE config #5 — wider/deeper backbone (~40M),
    # 12 s horizons; default = the flagship 10M leaderboard config
    if os.environ.get("BENCH_PRESET") == "scaled":
        from trafficbotsv15_tpu.config import scaled_config

        cfg = scaled_config()
    else:
        cfg = leaderboard_config()
    from trafficbotsv15_tpu.ops import flags as _flags

    _flags.configure(cfg.ops)  # env TB_* overrides still win (ops/flags.py)
    import dataclasses

    if os.environ.get("BENCH_REMAT"):  # full | dots | names | none
        cfg = dataclasses.replace(cfg, remat_policy=os.environ["BENCH_REMAT"])
    if os.environ.get("BENCH_TL_PREPASS"):  # 0/1: A/B the TL pre-pass hoist
        cfg = dataclasses.replace(cfg, tl_prepass=os.environ["BENCH_TL_PREPASS"] == "1")
    if os.environ.get("BENCH_TOKEN_DEDUP"):  # 0/1: A/B the K-futures token dedup
        cfg = dataclasses.replace(
            cfg, rollout_token_dedup=os.environ["BENCH_TOKEN_DEDUP"] == "1")
    if os.environ.get("BENCH_UNROLL"):
        cfg = dataclasses.replace(cfg, scan_unroll=int(os.environ["BENCH_UNROLL"]))
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

    n_steps = cfg.time_step_end - cfg.time_step_current  # 80 future steps

    if mode == "train":
        dt, _ = bench_train(cfg, model, params, batch, n_iters)
        n_chips = len([d for d in jax.devices() if d.platform != "cpu"]) or 1
        value = n_sc / dt / n_chips
        # MFU convention: model flops = 3x forward (fwd + bwd); the full-remat
        # replay recompute is excluded, so HFU is ~4/3 of this number
        n_steps_train = cfg.time_step_end - cfg.time_step_sim_start + 1
        flops = 3.0 * _rollout_flops(cfg, model, params, batch, 1, n_steps_train)
        print(json.dumps({
            "metric": "train_samples_per_sec_per_chip",
            "value": round(value, 3),
            "unit": "samples/s/chip",
            "vs_baseline": round(value / BASELINE_TRAIN_SAMPLES_PER_SEC_PER_CHIP, 2),
            **_mfu_fields(flops, dt),
        }))
        return

    if mode == "validate":
        # full validation step: reactive replay + joint futures + loss/error/
        # rule metrics + WOMD post-processing + native WOSAC realism — the
        # end-to-end per-batch workload of eval/runner.py::validate
        import dataclasses as _dc

        from trafficbotsv15_tpu.eval.runner import make_validate_step

        cfg = _dc.replace(cfg, n_joint_future_wosac=n_future)
        if os.environ.get("BENCH_REALISM") == "0":  # isolate the realism cost
            cfg = _dc.replace(cfg, native_wosac_realism=False)
        step = make_validate_step(cfg, model)

        def run_val(params, batch, key):
            out = step(params, batch, key)
            return jax.tree_util.tree_map(jnp.sum, out["loss_metrics"]), jnp.sum(out["wosac_trajs"]), (
                out["wosac_realism"]["metametric"] if "wosac_realism" in out else 0.0
            )

        key = jax.random.PRNGKey(1)
        compiled = jax.jit(run_val).lower(params, batch, key).compile()
        for w in range(2):  # second warmup absorbs the post-compile stall
            jax.block_until_ready(compiled(params, batch, jax.random.fold_in(key, 990 + w)))
        t0 = time.perf_counter()
        for i in range(n_iters):
            out = compiled(params, batch, jax.random.fold_in(key, i))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n_iters
        n_chips = len([d for d in jax.devices() if d.platform != "cpu"]) or 1
        value = n_sc / dt / n_chips
        flops = (_rollout_flops(cfg, model, params, batch, 1, n_steps)
                 + _rollout_flops(cfg, model, params, batch, n_future, n_steps))
        print(json.dumps({
            "metric": "wosac_validate_scenarios_per_sec_per_chip",
            "value": round(value, 3),
            "unit": "scenarios/s/chip",
            "vs_baseline": round(value / BASELINE_VALIDATE_SCENARIOS_PER_SEC_PER_CHIP, 2),
            **_mfu_fields(flops, dt),
        }))
        return

    if mode == "serve":
        # interactive serving latency: one policy step of the device-resident
        # InteractiveSimulator (async dispatch, no per-step host sync). No
        # reference analogue exists (its player_policy is a dead stub,
        # waymo_motion.py:228-238); vs_baseline is the REAL-TIME requirement
        # (10 Hz sim -> 10 steps/s), i.e. the real-time factor.
        from trafficbotsv15_tpu.serve import InteractiveSimulator

        n_serve = int(os.environ.get("BENCH_SERVE_STEPS", "50"))
        sim = InteractiveSimulator(cfg, params)
        sim.reset(batch, jax.random.PRNGKey(2))
        for _ in range(3):  # compile + absorb the post-compile stall
            out = sim.step(fetch=False)
        jax.block_until_ready(out["pose"])
        t0 = time.perf_counter()
        for _ in range(n_serve):
            out = sim.step(fetch=False)
        jax.block_until_ready(out["pose"])
        dt = (time.perf_counter() - t0) / n_serve
        print(json.dumps({
            "metric": "serve_policy_steps_per_sec",
            "value": round(1.0 / dt, 1),
            "unit": "steps/s (1 step = 0.1 s sim time)",
            "vs_baseline": round(1.0 / dt / 10.0, 2),
            "latency_ms": round(dt * 1e3, 3),
        }))
        return

    def run(params, batch, key):
        _, buf = joint_future_pred(cfg, model, params, batch, key,
                                   n_joint_future=n_future, check_level=check_level)
        # reduce outputs so only scalars come back to host
        return jnp.sum(buf.pred_pose), jnp.sum(buf.violation["collided_wosac"])

    key = jax.random.PRNGKey(1)
    run_jit = jax.jit(run).lower(params, batch, key).compile()

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

    agent_steps = n_sc * n_future * cfg.data.n_ag * n_steps
    n_chips = len([d for d in jax.devices() if d.platform != "cpu"]) or 1
    value = agent_steps / dt / n_chips

    print(json.dumps({
        "metric": "wosac_rollout_agent_steps_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "agent-steps/s/chip",
        "vs_baseline": round(value / BASELINE_AGENT_STEPS_PER_SEC_PER_CHIP, 2),
        **_mfu_fields(_rollout_flops(cfg, model, params, batch, n_future, n_steps), dt),
    }))


if __name__ == "__main__":
    main()
