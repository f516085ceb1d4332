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
