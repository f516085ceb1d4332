"""Multi-host data sharding (torch DistributedSampler semantics,
reference data_h5_womd.py:206-216 under PL DDP).

Every host draws the SAME epoch permutation, takes a disjoint stride slice,
wrap-padded so all hosts run the same number of batches. These tests exercise
the shard logic single-process; the global-array assembly path
(parallel.mesh.put_global) reduces to device_put when process_count == 1.
"""

import numpy as np
import pytest

import jax

from trafficbotsv15_tpu.data.h5_dataset import DataLoader


class _IdxDataset:
    """Items carry their own index so shard membership is observable."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"idx": np.asarray([i], np.int64)}


def _indices(loader):
    return [int(i) for b in loader for i in b["idx"][:, 0]]


def test_shards_disjoint_and_covering():
    ds = _IdxDataset(10)
    shard0 = DataLoader(ds, batch_size=2, num_workers=0, shard_index=0, num_shards=2)
    shard1 = DataLoader(ds, batch_size=2, num_workers=0, shard_index=1, num_shards=2)
    i0, i1 = _indices(shard0), _indices(shard1)
    assert len(i0) == len(i1) == 5  # equal length: hosts stay in lockstep
    assert set(i0) | set(i1) == set(range(10))
    assert set(i0).isdisjoint(i1)
    assert len(shard0) == len(shard1) == 3  # ceil(5 / 2) batches each


def test_uneven_dataset_wrap_pads():
    """11 items over 2 shards: both shards see 6 (one wrapped repeat), so no
    host runs an extra step and hangs the collectives."""
    ds = _IdxDataset(11)
    loaders = [DataLoader(ds, batch_size=3, num_workers=0, shard_index=s, num_shards=2)
               for s in (0, 1)]
    idx = [_indices(ld) for ld in loaders]
    assert len(idx[0]) == len(idx[1]) == 6
    assert set(idx[0]) | set(idx[1]) == set(range(11))  # everything still seen


def test_tiny_dataset_never_leaves_a_shard_empty():
    """pad > len(ds): the permutation must CYCLE (np.resize), not single-slice
    — an empty shard would leave that host issuing no steps while the others
    hang in collectives."""
    ds = _IdxDataset(1)
    for s in range(4):
        ld = DataLoader(ds, batch_size=1, num_workers=0, shard_index=s, num_shards=4)
        assert _indices(ld) == [0]
        assert len(ld) == 1


def test_shards_use_same_permutation():
    """Shuffled shards partition the SAME epoch permutation: interleaving the
    two shard streams reconstructs it exactly."""
    ds = _IdxDataset(8)
    full = DataLoader(ds, batch_size=8, num_workers=0, shuffle=True, seed=7)
    full.set_epoch(3)
    perm = _indices(full)
    shards = []
    for s in (0, 1):
        ld = DataLoader(ds, batch_size=4, num_workers=0, shuffle=True, seed=7,
                        shard_index=s, num_shards=2)
        ld.set_epoch(3)
        shards.append(_indices(ld))
    interleaved = [shards[i % 2][i // 2] for i in range(8)]
    assert interleaved == perm


def test_single_shard_unchanged():
    """num_shards=1 must be bit-identical to the pre-sharding loader."""
    ds = _IdxDataset(5)
    a = DataLoader(ds, batch_size=2, num_workers=0, shuffle=True, seed=3)
    b = DataLoader(ds, batch_size=2, num_workers=0, shuffle=True, seed=3,
                   shard_index=0, num_shards=1)
    a.set_epoch(0), b.set_epoch(0)
    assert _indices(a) == _indices(b)


def test_tbcache_loader_shard_logic():
    """Same stride/wrap semantics on the TBCache loader (stub dataset — the
    shard logic is independent of the C++ engine)."""
    from trafficbotsv15_tpu.data.tbcache import TBCacheLoader

    class _Stub:
        def __len__(self):
            return 9

        def get_batch(self, b):
            return {"idx": np.asarray(b)}

    idx = []
    for s in (0, 1, 2):
        ld = TBCacheLoader(_Stub(), batch_size=3, shard_index=s, num_shards=3)
        idx.append([int(i) for b in ld for i in b["idx"]])
    assert all(len(i) == 3 for i in idx)
    assert set().union(*idx) == set(range(9))
    assert sum(len(set(i)) for i in idx) == 9  # disjoint


def test_put_global_single_process_is_device_put():
    from jax.sharding import PartitionSpec as P, NamedSharding

    from trafficbotsv15_tpu.parallel.mesh import make_mesh, put_global

    mesh = make_mesh()
    x = np.arange(16, dtype=np.float32).reshape(8, 2)
    arr = put_global(x, NamedSharding(mesh, P("data")))
    np.testing.assert_array_equal(np.asarray(arr), x)
    assert arr.sharding.spec == P("data")
