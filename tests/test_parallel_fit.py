"""fit() under the fsdp / tp parameter-sharding strategies (ParallelCfg) on
the virtual 8-device mesh — the user-reachable path for models that outgrow
one chip (the dryrun proves the raw step; this proves the CLI surface)."""

import numpy as np
import jax
import pytest

from trafficbotsv15_tpu.train.checkpoint import CheckpointManager


@pytest.mark.slow
@pytest.mark.parametrize("strategy,model_axis", [("fsdp", 1), ("tp", 2)])
def test_fit_parallel_strategy(tmp_path, monkeypatch, strategy, model_axis):
    from trafficbotsv15_tpu import run as run_mod

    monkeypatch.chdir(tmp_path)
    ckpt_dir = str(tmp_path / f"ckpt_{strategy}")
    run_mod.main([
        "action=fit", "preset=tiny", "data=synthetic", f"ckpt_dir={ckpt_dir}",
        f"parallel.strategy={strategy}", f"parallel.model_axis={model_axis}",
        "parallel.fsdp_min_size=256", "max_steps=2", "max_epochs=1",
        "batch_size_train=1", "limit_train_batches=0.5", "validate_every_epoch=false",
    ])
    state, rcfg, meta = CheckpointManager(ckpt_dir).restore("last")
    assert rcfg.parallel.strategy == strategy
    assert meta["step"] == 2
    for leaf in jax.tree_util.tree_leaves(state["params"]):
        assert np.isfinite(np.asarray(leaf)).all()
