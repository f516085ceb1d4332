"""Tests for the native TBCache data engine (C++ mmap + threaded batch fill)."""

import shutil

import numpy as np
import pytest

from trafficbotsv15_tpu.config import DataCfg
from trafficbotsv15_tpu.data.synthetic import make_batch

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")


@pytest.fixture(scope="module")
def cache(tmp_path_factory):
    from trafficbotsv15_tpu.data import tbcache

    cfg = DataCfg(n_ag=8, n_mp=16, n_step=21, n_tl_lane=8, n_tl_stop=8)
    batch = make_batch(cfg, n_sc=6, seed=0)
    episodes = [{k: v[i] for k, v in batch.items()} for i in range(6)]
    path = tmp_path_factory.mktemp("tbc") / "train.tbcache"
    tbcache.write_cache(path, episodes)
    ds = tbcache.TBCacheDataset(path, n_threads=4)
    yield episodes, ds
    ds.close()


def test_roundtrip_single(cache):
    episodes, ds = cache
    assert len(ds) == 6
    for i in (0, 3, 5):
        item = ds[i]
        for k, v in episodes[i].items():
            np.testing.assert_array_equal(item[k], v, err_msg=k)


def test_batch_fill(cache):
    episodes, ds = cache
    idx = [5, 0, 2]
    out = ds.get_batch(idx)
    for j, i in enumerate(idx):
        for k in episodes[i]:
            np.testing.assert_array_equal(out[k][j], episodes[i][k], err_msg=k)


def test_loader(cache):
    episodes, ds = cache
    from trafficbotsv15_tpu.data.tbcache import TBCacheLoader

    loader = TBCacheLoader(ds, batch_size=4, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["agent/valid"].shape[0] == 4
    total = sum(b["agent/valid"].shape[0] for b in batches)
    assert total == 6


def test_throughput_vs_h5(tmp_path):
    """The C++ engine must beat the gzip-h5 reader it replaces (the reference
    DataLoader hot path, data_h5_womd.py:206-216) on records/s."""
    import time

    import h5py

    from trafficbotsv15_tpu.data import tbcache
    from trafficbotsv15_tpu.data.h5_dataset import H5Dataset

    cfg = DataCfg(n_ag=16, n_mp=64, n_step=21, n_tl_lane=8, n_tl_stop=8)
    n_ep = 24
    batch = make_batch(cfg, n_sc=n_ep, seed=3)
    episodes = [{k: v[i] for k, v in batch.items()} for i in range(n_ep)]
    schema = {k: v.shape for k, v in episodes[0].items()}

    h5p = tmp_path / "split.h5"
    with h5py.File(h5p, "w") as hf:  # gzip'd like the reference packer
        for i, ep in enumerate(episodes):
            g = hf.create_group(str(i))
            for k, v in ep.items():
                g.create_dataset(k, data=v, compression="gzip")
        hf.attrs["data_len"] = n_ep
    tbp = tmp_path / "split.tbcache"
    tbcache.write_cache(tbp, episodes)

    idx = list(range(n_ep))

    def time_reads(read_batch, passes=4):
        read_batch(idx)  # warm page cache / file handles
        t0 = time.perf_counter()
        for _ in range(passes):
            read_batch(idx)
        return n_ep * passes / (time.perf_counter() - t0)

    h5_ds = H5Dataset(str(h5p), schema)
    h5_rps = time_reads(lambda ix: [h5_ds[i] for i in ix])
    tb_ds = tbcache.TBCacheDataset(tbp, n_threads=2)
    tb_rps = time_reads(tb_ds.get_batch)
    tb_ds.close()
    # comfortably faster even on this 1-core image; typical ratio is >>2
    assert tb_rps > h5_rps, (tb_rps, h5_rps)


@pytest.mark.slow
def test_pack_to_tbcache_to_fit(tmp_path, monkeypatch):
    """Full integration of the native engine as the WOMD path: packed h5 ->
    convert_h5 -> tbcache -> `action=fit data=tbcache` runs training steps."""
    import h5py
    import jax

    from trafficbotsv15_tpu import run as run_mod
    from trafficbotsv15_tpu.config import tiny_config
    from trafficbotsv15_tpu.data import tbcache
    from trafficbotsv15_tpu.train.checkpoint import CheckpointManager

    monkeypatch.chdir(tmp_path)
    cfg = tiny_config()
    n_ep = 16  # 2 batches of 1 x 8 devices on the virtual mesh
    batch = make_batch(cfg.data, n_sc=n_ep, seed=7)
    episodes = [{k: v[i] for k, v in batch.items()} for i in range(n_ep)]
    schema = {k: v.shape for k, v in episodes[0].items()}
    h5p = tmp_path / "training.h5"
    with h5py.File(h5p, "w") as hf:
        for i, ep in enumerate(episodes):
            g = hf.create_group(str(i))
            for k, v in ep.items():
                g.create_dataset(k, data=v, compression="gzip")
        hf.attrs["data_len"] = n_ep
    for split in ("training", "validation"):
        assert tbcache.convert_h5(h5p, tmp_path / f"{split}.tbcache", schema) == n_ep

    ckpt_dir = str(tmp_path / "ckpt")
    run_mod.main([
        "action=fit", "preset=tiny", "data=tbcache", f"data_dir={tmp_path}",
        f"ckpt_dir={ckpt_dir}", "max_steps=2", "max_epochs=1",
        "batch_size_train=1", "limit_train_batches=1.0", "validate_every_epoch=false",
    ])
    state, _, meta = CheckpointManager(ckpt_dir).restore("last")
    assert meta["step"] == 2
    for leaf in jax.tree_util.tree_leaves(state["params"]):
        assert np.isfinite(np.asarray(leaf)).all()


def test_h5_conversion(cache, tmp_path):
    import h5py

    from trafficbotsv15_tpu.data import tbcache

    episodes, _ = cache
    h5p = tmp_path / "mini.h5"
    with h5py.File(h5p, "w") as hf:
        for i, ep in enumerate(episodes):
            g = hf.create_group(str(i))
            for k, v in ep.items():
                g.create_dataset(k, data=v)
        hf.attrs["data_len"] = len(episodes)
    schema = {k: v.shape for k, v in episodes[0].items()}
    out = tmp_path / "mini.tbcache"
    n = tbcache.convert_h5(h5p, out, schema)
    assert n == len(episodes)
    ds2 = tbcache.TBCacheDataset(out)
    np.testing.assert_array_equal(ds2[2]["agent/pos"], episodes[2]["agent/pos"])
    ds2.close()
