"""CLI entry point: fit / validate / test.

Parity target: /root/reference/src/run.py (Hydra + PyTorch Lightning Trainer).
Orchestration is a plain python loop around the jitted GSPMD train/eval steps:
  python -m trafficbotsv15_tpu.run action=fit data=synthetic max_steps=100
Overrides use key=value (dots for nesting, e.g. optimizer.lr=1e-4).
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from trafficbotsv15_tpu.config import ExperimentCfg, config_from_dict, config_to_dict, leaderboard_config, tiny_config
from trafficbotsv15_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from trafficbotsv15_tpu.train.checkpoint import CheckpointManager
from trafficbotsv15_tpu.train.optimizer import make_optimizer
from trafficbotsv15_tpu.train.pipeline import build_model, init_params, make_train_step
from trafficbotsv15_tpu.utils.logging import MetricsLogger


def parse_overrides(argv) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for arg in argv:
        if "=" not in arg:
            continue
        k, v = arg.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        cur = out
        parts = k.split(".")
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return out


def apply_overrides(cfg: ExperimentCfg, overrides: Dict[str, Any]) -> ExperimentCfg:
    d = config_to_dict(cfg)

    def deep(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                deep(dst[k], v)
            else:
                dst[k] = v

    deep(d, overrides)
    return config_from_dict(d)


def make_dataloaders(cfg: ExperimentCfg, data: str, data_dir: Optional[str], n_synthetic: int = 64,
                     test_mode: bool = False):
    # each process loads only the rows its local devices will hold: per-host
    # batch = batch_size x local devices, and on multi-host jobs the dataset is
    # split into disjoint per-host shards (the reference's DistributedSampler,
    # data_h5_womd.py:206-216); parallel.mesh.put_global assembles the global
    # batch from the per-process pieces without cross-host transfer
    n_dev = jax.local_device_count()
    shard = dict(shard_index=jax.process_index(), num_shards=jax.process_count())
    if data == "synthetic":
        from trafficbotsv15_tpu.data.synthetic import make_batch

        class SynthLoader:
            def __init__(self, n_batches, n_sc, seed0, test_mode=False):
                self.n_batches, self.n_sc, self.seed0 = n_batches, n_sc, seed0
                self.test_mode = test_mode

            def __len__(self):
                return self.n_batches

            def __iter__(self):
                return self.iter_from(0)

            def iter_from(self, start_batch=0):
                for i in range(start_batch, self.n_batches):
                    # disjoint per-host streams: stride the seed space by the
                    # process grid (reduces to seed0+i single-process)
                    seed = self.seed0 + i * shard["num_shards"] + shard["shard_index"]
                    yield make_batch(cfg.data, n_sc=self.n_sc, seed=seed,
                                     test_mode=self.test_mode)

        bs_train = max(cfg.batch_size_train, 1) * n_dev
        bs_test = max(cfg.batch_size_test, 1) * n_dev
        return (
            SynthLoader(n_synthetic // bs_train, bs_train, 0),
            SynthLoader(max(n_synthetic // bs_test // 4, 1), bs_test, 10_000,
                        test_mode=test_mode),
        )
    if data == "tbcache":
        from trafficbotsv15_tpu.data.tbcache import TBCacheDataset, TBCacheLoader

        train_ds = TBCacheDataset(f"{data_dir}/training.tbcache")
        val_ds = TBCacheDataset(f"{data_dir}/validation.tbcache")
        return (
            TBCacheLoader(train_ds, cfg.batch_size_train * n_dev, shuffle=True, seed=cfg.seed,
                          **shard),
            TBCacheLoader(val_ds, cfg.batch_size_test * n_dev, shuffle=False, **shard),
        )
    from trafficbotsv15_tpu.data.h5_dataset import DataLoader, H5Dataset, tensor_size_train, tensor_size_val

    train_ds = H5Dataset(f"{data_dir}/training.h5", tensor_size_train(cfg.data))
    val_ds = H5Dataset(f"{data_dir}/validation.h5", tensor_size_val(cfg.data), with_attrs=True)
    return (
        DataLoader(train_ds, cfg.batch_size_train * n_dev, shuffle=True, seed=cfg.seed, **shard),
        DataLoader(val_ds, cfg.batch_size_test * n_dev, shuffle=False, **shard),
    )


def _place_like(template, value):
    """Device-put a restored host pytree onto the placements (sharding + dtype)
    of a freshly initialized template with the same structure."""
    from trafficbotsv15_tpu.parallel.mesh import put_replicated

    return jax.tree_util.tree_map(
        lambda t, x: put_replicated(np.asarray(x, t.dtype), t.sharding) if hasattr(t, "shape") else x,
        template, value,
    )


def fit(cfg: ExperimentCfg, train_loader, val_loader, ckpt_dir: str = "ckpt",
        max_steps: Optional[int] = None, log_every: int = 50,
        validate_every_epoch: Optional[bool] = None, val_max_batches: Optional[int] = None,
        ema_decay: float = 0.0, profile_dir: Optional[str] = None, resume: bool = False):
    # defaults come from the config so the reference behavior (top-1 on
    # val/loss + last, every epoch) is the default fit path
    if validate_every_epoch is None:
        validate_every_epoch = cfg.validate_every_epoch
    if val_max_batches is None:
        val_max_batches = cfg.val_epoch_batches
    mesh = make_mesh(n_model=cfg.parallel.model_axis)
    b_sh, repl = batch_sharding(mesh), replicated(mesh)
    logger = MetricsLogger()

    model = build_model(cfg)
    first = next(iter(train_loader))
    first = {k: jnp.asarray(v) for k, v in first.items() if not isinstance(v, list)}
    params = init_params(cfg, model, first, jax.random.PRNGKey(cfg.seed))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"model parameters: {n_params/1e6:.2f}M, devices: {len(jax.devices())}, "
          f"parallel: {cfg.parallel.strategy}")

    steps_per_epoch = max(int(len(train_loader) * cfg.limit_train_batches), 1)
    opt = make_optimizer(cfg.optimizer, steps_per_epoch=steps_per_epoch)
    ema_decay = ema_decay or cfg.ema_decay
    ckpt = CheckpointManager(ckpt_dir)

    # training resumption (reference: trainer.resume_from_checkpoint,
    # run.py:45-46): restore params/opt_state(+ema/swa) and the step counter
    # from the "last" checkpoint, then fast-forward the epoch's loader so data
    # order continues where the interrupted run stopped
    start_step = 0
    restored = None
    if resume and not (ckpt.dir / "last.json").exists():
        # auto-restart wrappers pass resume=true unconditionally; the very
        # first launch has nothing to restore and must start fresh
        print(f"resume requested but {ckpt_dir}/last not found — starting fresh")
        resume = False
    if resume:
        builders = {
            "params": lambda: params,
            "opt_state": lambda: opt.init(params),
            "ema": lambda: jax.tree_util.tree_map(lambda p: jnp.asarray(p, jnp.float32), params),
            "swa": lambda: params,
            "swa_state": lambda: (params, jnp.zeros(())),
        }
        restored, _, meta = ckpt.restore_resume(builders)
        params = restored["params"]
        start_step = int(meta.get("step", 0))
        print(f"resumed from {ckpt_dir}/last at step {start_step}")
    # parameter placement by strategy (ParallelCfg): dp replicates; fsdp/tp
    # shard the params and let GSPMD propagate shardings through the step
    # (opt state inherits the param shardings via opt.init on placed params)
    if cfg.parallel.strategy == "fsdp":
        from trafficbotsv15_tpu.parallel.mesh import fsdp_shard_params

        params = fsdp_shard_params(params, mesh, min_size=cfg.parallel.fsdp_min_size)
        opt_state = opt.init(params)  # inherits the param shardings
    elif cfg.parallel.strategy == "tp":
        from trafficbotsv15_tpu.parallel.mesh import tp_shard_params

        params = tp_shard_params(params, mesh)
        opt_state = opt.init(params)
    else:
        from trafficbotsv15_tpu.parallel.mesh import put_replicated

        params = jax.tree_util.tree_map(lambda x: put_replicated(x, repl), params)
        opt_state = jax.tree_util.tree_map(
            lambda x: put_replicated(x, repl) if hasattr(x, "shape") else x, opt.init(params))
    if restored is not None and "opt_state" in restored:
        opt_state = _place_like(opt_state, restored["opt_state"])

    # epoch is a traced scalar (teacher-forcing schedules are traceable in it)
    # so epoch changes do NOT trigger a recompile
    # scoped_for_mesh: the Pallas KNN kernel inside the step shard_maps over
    # the mesh's data axis instead of being GSPMD-replicated (ops.pallas_knn)
    from trafficbotsv15_tpu.ops.pallas_knn import scoped_for_mesh

    if cfg.parallel.strategy == "dp":
        train_step = jax.jit(
            scoped_for_mesh(make_train_step(cfg, model, opt), mesh),
            in_shardings=(repl, repl, b_sh, repl, repl), out_shardings=(repl, repl, repl),
            donate_argnums=(0, 1),
        )
    else:
        # shardings inferred from the placed params/opt_state; only the batch
        # is pinned to the data axis
        train_step = jax.jit(
            scoped_for_mesh(make_train_step(cfg, model, opt), mesh), donate_argnums=(0, 1))
    key = jax.random.PRNGKey(cfg.seed + 1)
    if start_step:
        # a fresh stream for the continuation: deterministic given (seed, step),
        # though not bit-identical to the keys an uninterrupted run would use
        key = jax.random.fold_in(key, start_step)
    step = start_step
    t_start = time.time()

    ema = None
    ema_step = None
    if ema_decay > 0:
        from trafficbotsv15_tpu.train.swa import ema_init, ema_update

        ema = ema_init(params)
        if restored is not None and "ema" in restored:
            ema = _place_like(ema, restored["ema"])
        ema_step = jax.jit(lambda e, p: ema_update(e, p, ema_decay), donate_argnums=(0,))

    # SWA (reference: PL StochasticWeightAveraging callback): equal-weight
    # average of params from swa_epoch_start * max_epochs onwards
    swa_state = None
    swa_step = None
    if cfg.swa:
        from trafficbotsv15_tpu.train.swa import swa_init, swa_update

        swa_start = int(cfg.swa_epoch_start * cfg.max_epochs) * steps_per_epoch
        swa_state = swa_init(params)
        if restored is not None and "swa_state" in restored:
            swa_state = _place_like(swa_state, tuple(restored["swa_state"]))
        swa_step = jax.jit(
            lambda s, p, i: swa_update(s, p, i, swa_start), donate_argnums=(0,)
        )

    def snapshot():
        state = {"params": params, "opt_state": opt_state}
        if ema is not None:
            state["ema"] = ema
        if swa_state is not None:
            from trafficbotsv15_tpu.train.swa import swa_params

            state["swa"] = swa_params(swa_state, params)
            state["swa_state"] = swa_state
        return state

    from trafficbotsv15_tpu.parallel.mesh import device_prefetch

    # preemption handling (the reference's SLURM trap only echoes;
    # bash/train.sh): SIGTERM/SIGINT request a graceful stop — the current
    # step finishes, "last" is checkpointed, and fit returns so a wrapper can
    # relaunch with resume=true. Second SIGINT falls through to KeyboardInterrupt.
    import signal

    stop_signal = []
    prev_handlers = {}

    def _request_stop(signum, frame):
        if stop_signal and signum == signal.SIGINT:
            raise KeyboardInterrupt
        stop_signal.append(signum)
        print(f"signal {signal.Signals(signum).name} received — "
              "checkpointing after this step, then exiting (resume with resume=true)")

    try:
        for sig in (signal.SIGTERM, signal.SIGINT):
            prev_handlers[sig] = signal.signal(sig, _request_stop)
    except ValueError:
        prev_handlers = {}  # not in the main thread (e.g. threaded tests)

    start_epoch = min(start_step // steps_per_epoch, max(cfg.max_epochs - 1, 0))
    last_saved_step = -1
    try:
        for epoch in range(start_epoch, cfg.max_epochs):
            if hasattr(train_loader, "set_epoch"):
                # shuffle order keyed on the absolute epoch: a resumed run
                # replays the interrupted epoch's permutation, so the index
                # fast-forward below lands on the right data
                train_loader.set_epoch(epoch)
            skip = max(step - epoch * steps_per_epoch, 0)
            if hasattr(train_loader, "iter_from"):
                epoch_iter = train_loader.iter_from(skip)  # index skip, no decode
            else:
                epoch_iter = iter(train_loader)
                for _ in range(skip):
                    next(epoch_iter, None)
            for batch in device_prefetch(epoch_iter, b_sh):
                if step >= steps_per_epoch * (epoch + 1):
                    break
                key, k = jax.random.split(key)
                # tracing / profiling hook (SURVEY.md §5): capture steps 3-5 once
                # compiles are warm; view with xprof/tensorboard or Perfetto
                if profile_dir and step == 3:
                    jax.profiler.start_trace(profile_dir)
                params, opt_state, metrics = train_step(params, opt_state, batch, k, epoch)
                if ema is not None:
                    ema = ema_step(ema, params)
                if swa_state is not None:
                    swa_state = swa_step(swa_state, params, jnp.asarray(step, jnp.float32))
                step += 1
                if profile_dir and step == 6:
                    jax.block_until_ready(metrics["training/loss"])
                    jax.profiler.stop_trace()
                if step % log_every == 0 or step == 1:
                    m = {kk: float(vv) for kk, vv in metrics.items()}
                    m["steps_per_sec"] = step / (time.time() - t_start)
                    # LearningRateMonitor equivalent (SURVEY.md §5 W&B LR logging)
                    m["lr"] = cfg.optimizer.lr * (cfg.optimizer.scheduler_gamma
                                                  ** ((step // steps_per_epoch) // cfg.optimizer.scheduler_step_epochs))
                    logger.log(step, m)
                if cfg.ckpt_every_steps and step % cfg.ckpt_every_steps == 0:
                    ckpt.save_last(snapshot(), cfg, {"step": step, "epoch": epoch})
                    last_saved_step = step
                if stop_signal:
                    break
                if max_steps and step >= max_steps:
                    break
            state = snapshot()
            # skip the epoch-end save when an in-loop ckpt_every_steps save
            # already wrote this exact step — the async manager would block on
            # the in-flight write just to redo an identical multi-GB checkpoint
            if step != last_saved_step:
                ckpt.save_last(state, cfg, {"step": step, "epoch": epoch})
                last_saved_step = step
            if stop_signal:
                break
            if validate_every_epoch:
                from trafficbotsv15_tpu.eval.runner import validate

                vm = validate(cfg, val_loader, params=params, max_batches=val_max_batches, logger=logger)
                ckpt.save_best(state, cfg, vm.get("val/loss", 0.0), {"step": step, "epoch": epoch})
            if max_steps and step >= max_steps:
                break
    finally:
        # always restore handlers and flush the async save, even if a
        # step raises — leaked handlers would outlive fit() in-process.
        # Handler restore gets its own finally: if wait() re-raises a failed
        # async finalize, a leaked _request_stop would silently swallow every
        # later SIGTERM (its stop list is orphaned once fit returns).
        try:
            ckpt.wait()
        finally:
            for sig, h in prev_handlers.items():
                signal.signal(sig, h)
    return params, logger, bool(stop_signal)


def main(argv=None):
    import os

    if os.environ.get("JAX_PLATFORMS", "").split(",")[0] == "cpu":
        # honor JAX_PLATFORMS=cpu on images where a TPU plugin (axon) would
        # otherwise win over the env var (same fix as tests/conftest.py)
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized
    from trafficbotsv15_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()
    argv = sys.argv[1:] if argv is None else argv
    overrides = parse_overrides(argv)
    raw_overrides = dict(overrides)
    action = overrides.pop("action", "fit")
    data = overrides.pop("data", "synthetic")
    data_dir = overrides.pop("data_dir", None)
    preset = overrides.pop("preset", "leaderboard")
    max_steps = overrides.pop("max_steps", None)
    log_every = int(overrides.pop("log_every", 50))
    video_dir = overrides.pop("video_dir", None)
    ckpt_dir = overrides.pop("ckpt_dir", "ckpt")
    profile_dir = overrides.pop("profile_dir", None)
    resume = bool(overrides.pop("resume", False))
    if overrides.pop("debug_nans", False):
        # NaN-checking opt-in (SURVEY.md §5: reference's detect_anomaly analog)
        jax.config.update("jax_debug_nans", True)
    if overrides.pop("rbg", False):
        # TPU-native counter PRNG for dropout/sampling: +4.6% train throughput
        # on v5e (33.2x at batch 16, docs/PERF.md). Streams differ from the
        # default threefry, so seeds are not bit-reproducible across the flag.
        jax.config.update("jax_default_prng_impl", "unsafe_rbg")

    cfg = tiny_config() if preset == "tiny" else leaderboard_config()
    if resume:
        # base the continuation on the checkpoint's own config (reference
        # resume semantics, run.py:32-46: saved hparams + CLI overrides on top)
        from pathlib import Path

        last_json = Path(ckpt_dir) / "last.json"
        if last_json.exists():
            cfg = config_from_dict(json.loads(last_json.read_text())["config"])
    cfg = apply_overrides(cfg, overrides)
    from trafficbotsv15_tpu.ops import flags as _flags

    _flags.configure(cfg.ops)  # env TB_* overrides still win (ops/flags.py)

    if action == "test" and "batch_size_test" not in raw_overrides:
        # submission workload: K=128 futures of ONE scenario share all its
        # static map/KNN work — measured optimum is batch 1 (314k vs 240k
        # agent-steps/s at batch 4 on v5e, docs/PERF.md); the reference's
        # 3/GPU was a 24-GB-4090 memory choice (bash/submission.sh)
        import dataclasses as _dc

        cfg = _dc.replace(cfg, batch_size_test=1)

    train_loader, val_loader = make_dataloaders(cfg, data, data_dir,
                                                test_mode=action == "test")
    if action == "fit":
        *_, stopped = fit(cfg, train_loader, val_loader, ckpt_dir=ckpt_dir, max_steps=max_steps,
                          log_every=log_every, profile_dir=profile_dir, resume=resume)
        if stopped:
            # signal-initiated stop is NOT a clean finish: exit 128+SIGTERM so
            # restart wrappers (launch/train_preemptible.sh) relaunch with
            # resume=true instead of reporting "finished cleanly" mid-training
            raise SystemExit(143)
    elif action == "validate":
        from trafficbotsv15_tpu.eval.runner import validate

        # video_dir=<dir> renders the reference's per-epoch rollout videos
        # (waymo_motion.py:662-671 rank-0 cv2/ffmpeg path)
        validate(cfg, val_loader, ckpt_dir=ckpt_dir, video_dir=video_dir)
    elif action == "test":
        from trafficbotsv15_tpu.eval.runner import test_submission
        from trafficbotsv15_tpu.train.checkpoint import CheckpointManager

        if data == "synthetic":
            # param init traces the posterior path, which needs a GT-carrying
            # (train-schema) batch; the synthetic test loader is history-only
            from trafficbotsv15_tpu.data.synthetic import make_batch as _mb

            first = _mb(cfg.data, n_sc=1, seed=0)
        else:
            first = next(iter(val_loader))  # h5 val schema is the train/test union
        first_j = {k: jnp.asarray(np.asarray(v)) for k, v in first.items() if not isinstance(v, list)}
        model = build_model(cfg)
        example = init_params(cfg, model, first_j, jax.random.PRNGKey(0))
        # morph-for-submission: K=128 futures (configs/resume/submission.yaml);
        # an explicit n_joint_future_wosac=... CLI override wins
        sub_k = int(raw_overrides.get("n_joint_future_wosac", 128))
        state, cfg, _ = CheckpointManager(ckpt_dir).restore(
            "best", {"params": example}, config_overrides={"n_joint_future_wosac": sub_k}
        )
        test_submission(cfg, val_loader, state["params"])
    else:
        raise SystemExit(f"unknown action {action}")


if __name__ == "__main__":
    main()
