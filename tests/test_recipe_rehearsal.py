"""End-to-end recipe rehearsal at tiny scale: one command sequence covering
the full lifecycle the leaderboard recipe uses — multi-epoch fit with SWA+EMA,
StepLR stepping, per-epoch val driving best/last checkpoints, then the
morph-for-submission restore into `action=test` producing submission shards
(reference: run.py:32-63 + configs/resume/submission.yaml + bash/*.sh)."""

import json

import numpy as np
import pytest

from trafficbotsv15_tpu.train.checkpoint import CheckpointManager


@pytest.mark.slow
def test_recipe_rehearsal(tmp_path, monkeypatch):
    import waymo_stub

    waymo_stub.install()  # structural proto stubs -> submission writers active
    from trafficbotsv15_tpu import run as run_mod

    monkeypatch.chdir(tmp_path)
    ckpt_dir = str(tmp_path / "ckpt")

    # --- fit: 2 epochs x 3 steps, SWA + EMA on, StepLR stepping every epoch,
    # per-epoch val (the default) ranking checkpoints
    run_mod.main([
        "action=fit", "preset=tiny", "data=synthetic", f"ckpt_dir={ckpt_dir}",
        "max_epochs=2", "limit_train_batches=0.05", "batch_size_train=1",
        "swa=true", "swa_epoch_start=0.0", "ema_decay=0.5",
        "optimizer.scheduler_step_epochs=1", "val_epoch_batches=1",
        "batch_size_test=2", "log_every=1",
    ])

    # best + last checkpoints with config snapshot and meta
    last, last_cfg, last_meta = CheckpointManager(ckpt_dir).restore("last")
    assert last_meta["epoch"] == 1 and last_meta["step"] >= 2
    assert {"params", "opt_state", "ema", "swa"} <= set(last)
    best, _, best_meta = CheckpointManager(ckpt_dir).restore("best")
    assert np.isfinite(best_meta["score"])
    import jax

    for tree_name in ("swa", "ema", "params"):
        for leaf in jax.tree_util.tree_leaves(last[tree_name]):
            assert np.isfinite(np.asarray(leaf)).all(), tree_name

    # StepLR stepped between epochs (gamma=0.5 every 1 epoch) — visible in the
    # logged lr stream (LearningRateMonitor parity)
    recs = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    lrs = sorted({r["lr"] for r in recs if "lr" in r}, reverse=True)
    assert len(lrs) >= 2 and lrs[1] == pytest.approx(lrs[0] * 0.5)
    # per-epoch validation emitted val metrics (drives save_best)
    assert any("val/loss" in r for r in recs)

    # --- morph-for-submission: restore best with K override, test split
    # (history-only schema), submission shards written via the proto stubs
    run_mod.main([
        "action=test", "preset=tiny", "data=synthetic", f"ckpt_dir={ckpt_dir}",
        "n_joint_future_wosac=4", "batch_size_test=2",
    ])
    wosac_shards = list(tmp_path.glob("WOSAC/submission.binproto-*"))
    assert wosac_shards, "WOSAC submission shards missing"
    womd_bins = list(tmp_path.glob("*_WOMD/*_WOMD.bin"))
    assert womd_bins, "WOMD submission bin missing"
