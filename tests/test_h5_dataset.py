"""h5 dataset reader + prefetching loader against a mini packed file."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from trafficbotsv15_tpu.config import DataCfg
from trafficbotsv15_tpu.data.h5_dataset import DataLoader, H5Dataset, tensor_size_train, tensor_size_val
from trafficbotsv15_tpu.data.synthetic import make_batch


@pytest.fixture(scope="module")
def h5_file(tmp_path_factory):
    cfg = DataCfg(n_ag=8, n_mp=16, n_step=21, n_tl_lane=8, n_tl_stop=8)
    batch = make_batch(cfg, n_sc=5, seed=1)
    path = tmp_path_factory.mktemp("h5") / "training.h5"
    with h5py.File(path, "w") as hf:
        for i in range(5):
            g = hf.create_group(str(i))
            g.attrs["scenario_id"] = f"scn{i:04d}"
            g.attrs["scenario_center"] = np.zeros(2, np.float32)
            g.attrs["scenario_yaw"] = np.float32(0.0)
            g.attrs["with_map"] = True
            for k, v in batch.items():
                g.create_dataset(k, data=v[i], compression="gzip", compression_opts=1)
        hf.attrs["data_len"] = 5
    return cfg, path, batch


def test_dataset_read(h5_file):
    cfg, path, batch = h5_file
    schema = tensor_size_train(cfg)
    ds = H5Dataset(path, schema)
    assert len(ds) == 5
    item = ds[2]
    for k in schema:
        np.testing.assert_array_equal(item[k], batch[k][2], err_msg=k)


def test_dataset_attrs(h5_file):
    cfg, path, batch = h5_file
    ds = H5Dataset(path, tensor_size_train(cfg), with_attrs=True)
    item = ds[1]
    assert "scenario_center" in item and "scenario_yaw" in item


def test_loader_batches(h5_file):
    cfg, path, batch = h5_file
    ds = H5Dataset(path, tensor_size_train(cfg))
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=3)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["agent/pos"].shape[0] == 2
    total = sum(b["agent/valid"].shape[0] for b in batches)
    assert total == 5
    # different epoch -> different order (shuffle reseeds per epoch)
    b2 = list(loader)
    assert len(b2) == 3


def test_loader_resume_skip_replays_same_data(h5_file):
    """Mid-epoch resume: set_epoch pins the shuffle permutation to the
    absolute epoch and iter_from(n) skips n batches by index (no decode),
    so the resumed stream is identical to the uninterrupted epoch's tail."""
    cfg, path, _ = h5_file
    ds = H5Dataset(path, tensor_size_train(cfg))
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=0, seed=3)
    loader.set_epoch(4)
    full = list(loader)
    loader.set_epoch(4)
    tail = list(loader.iter_from(1))
    assert len(tail) == len(full) - 1
    for a, b in zip(full[1:], tail):
        np.testing.assert_array_equal(a["agent/pos"], b["agent/pos"])
    # a fresh loader instance (restarted process) replays the same epoch
    loader2 = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=3)
    loader2.set_epoch(4)
    again = list(loader2)
    np.testing.assert_array_equal(full[0]["agent/pos"], again[0]["agent/pos"])


def test_dummy_agent_scalability(h5_file):
    """Scalability hook (data_h5_womd.py:60-62): mismatched agent count -> ones."""
    cfg, path, _ = h5_file
    big = DataCfg(n_ag=16, n_mp=16, n_step=21, n_tl_lane=8, n_tl_stop=8)
    ds = H5Dataset(path, tensor_size_train(big))
    item = ds[0]
    assert item["agent/valid"].shape == (16, 21)
    assert item["agent/pos"].shape == (16, 21, 3)
