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


def test_hybrid_slice_mesh_ordering():
    """Multi-slice device ordering: the model axis must stay inside a slice
    and slices must form contiguous outer blocks of the data axis (DCN outer,
    ICI inner). Exercised with the 8 virtual CPU devices + synthetic,
    deliberately interleaved slice ids; the resulting mesh must execute."""
    import jax.numpy as jnp

    from trafficbotsv15_tpu.parallel.mesh import (
        DATA_AXIS, MODEL_AXIS, Mesh, order_devices_for_slices, replicated,
    )

    devs = jax.devices()
    assert len(devs) == 8
    slice_ids = [0, 1, 0, 1, 0, 1, 0, 1]  # interleaved: ordering must fix this
    order, n_data = order_devices_for_slices(devs, slice_ids, n_model=2)
    assert n_data == 4 and len(order) == 8
    # slice 0's devices (even ids) first, then slice 1's
    assert [d.id % 2 for d in order] == [0] * 4 + [1] * 4
    # each model-axis row (consecutive pair) stays within one slice
    arr = np.asarray(order).reshape(n_data, 2)
    for row in arr:
        assert (row[0].id % 2) == (row[1].id % 2)

    mesh = Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    x = jax.device_put(jnp.ones((8, 4)), replicated(mesh))
    assert float(jnp.sum(x)) == 32.0

    # uneven slices truncate to the common per-slice count — loudly
    with pytest.warns(UserWarning, match="dropping 2 of 8"):
        order2, n_data2 = order_devices_for_slices(devs, [0, 0, 0, 1, 1, 2, 2, 2], n_model=1)
    assert n_data2 == 6 and len(order2) == 6

    # a slice smaller than the model axis cannot host it: clear error, not a
    # zero-device mesh (4- and 2-device slices, n_model=4 -> per would be 0)
    with pytest.raises(ValueError, match="n_model=4"):
        order_devices_for_slices(devs[:6], [0, 0, 0, 0, 1, 1], n_model=4)
