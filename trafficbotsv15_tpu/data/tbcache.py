"""TBCache: native binary episode cache (writer + ctypes bindings).

The C++ engine (cpp/tbcache.cc) mmaps a flat file of fixed-size records and
fills batches with a thread pool — replacing the reference's gzip'd-h5 +
worker-process DataLoader hot path (data_h5_womd.py). Typical speedup on WOMD
episodes is one to two orders of magnitude (parallel memcpy from page cache vs
gzip inflate per item).

Build once with `python -m trafficbotsv15_tpu.data.tbcache build-lib` (or it
auto-builds on first use if g++ is available).
"""

from __future__ import annotations

import ctypes
import subprocess
import sys
import threading
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_MAGIC = 0x54424341434845
_VERSION = 1
_DTYPES = [np.float32, np.float16, np.int64, np.bool_, np.int32, np.float64]
_DTYPE_CODE = {np.dtype(d): i for i, d in enumerate(_DTYPES)}

_LIB_DIR = Path(__file__).resolve().parent.parent / "cpp"
_SRC = _LIB_DIR / "tbcache.cc"
_SO = _LIB_DIR / "libtbcache.so"

_lib = None
_lib_lock = threading.Lock()


def build_lib(force: bool = False) -> Path:
    """Compile the C++ engine. Idempotent unless force."""
    if _SO.exists() and not force and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", str(_SO), str(_SRC), "-lpthread"]
    subprocess.run(cmd, check=True)
    return _SO


def _load_lib():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        build_lib()
        lib = ctypes.CDLL(str(_SO))
        lib.tbc_open.restype = ctypes.c_void_p
        lib.tbc_open.argtypes = [ctypes.c_char_p]
        lib.tbc_n_episodes.restype = ctypes.c_int64
        lib.tbc_n_episodes.argtypes = [ctypes.c_void_p]
        lib.tbc_n_fields.restype = ctypes.c_int64
        lib.tbc_n_fields.argtypes = [ctypes.c_void_p]
        lib.tbc_field_info.restype = ctypes.c_int
        lib.tbc_field_info.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.tbc_fill_batch_multi.restype = ctypes.c_int
        lib.tbc_fill_batch_multi.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int,
        ]
        lib.tbc_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


# ------------------------------------------------------------------- writer
def write_cache(path: str, episodes, fields: Optional[List[str]] = None) -> None:
    """Write an iterable of episode dicts (uniform shapes/dtypes) to a cache file."""
    path = Path(path)
    it = iter(episodes)
    first = next(it)
    if fields is None:
        fields = sorted(first.keys())
    meta: List[Tuple[str, np.dtype, Tuple[int, ...], int, int]] = []
    offset = 0
    for name in fields:
        arr = np.ascontiguousarray(first[name])
        code = _DTYPE_CODE[arr.dtype]
        meta.append((name, arr.dtype, arr.shape, offset, arr.nbytes))
        offset += arr.nbytes
    record_bytes = offset

    import struct

    header = struct.pack("<QII", _MAGIC, _VERSION, len(fields))
    header += struct.pack("<QQ", 0, record_bytes)  # n_episodes patched later
    for (name, dtype, shape, off, nbytes) in meta:
        nb = name.encode()
        header += struct.pack("<I", len(nb)) + nb
        header += struct.pack("<II", _DTYPE_CODE[dtype], len(shape))
        header += struct.pack(f"<{len(shape)}Q", *shape) if shape else b""
        header += struct.pack("<QQ", off, nbytes)
    pad = (-len(header)) % 64

    n = 0
    with open(path, "wb") as f:
        f.write(header + b"\0" * pad)
        for ep in [first] + list(it):
            for (name, dtype, shape, off, nbytes) in meta:
                arr = np.ascontiguousarray(ep[name], dtype=dtype)
                assert arr.shape == shape, (name, arr.shape, shape)
                f.write(arr.tobytes())
            n += 1
        # patch n_episodes at offset 16
        f.seek(16)
        f.write(struct.pack("<Q", n))


def convert_h5(h5_path: str, out_path: str, tensor_size: Dict[str, tuple]) -> int:
    """Convert a packed WOMD h5 split to TBCache format."""
    import h5py

    with h5py.File(h5_path, "r", libver="latest", swmr=True) as hf:
        n = int(hf.attrs["data_len"])

        def gen():
            for i in range(n):
                g = hf[str(i)]
                yield {k: np.ascontiguousarray(g[k]) for k in tensor_size}

        write_cache(out_path, gen(), fields=sorted(tensor_size))
    return n


# ------------------------------------------------------------------- reader
class TBCacheDataset:
    """Batch-oriented reader backed by the C++ engine."""

    def __init__(self, path: str, n_threads: int = 8):
        lib = _load_lib()
        self._lib = lib
        self._h = lib.tbc_open(str(path).encode())
        if not self._h:
            raise IOError(f"cannot open tbcache file {path}")
        self.n = int(lib.tbc_n_episodes(self._h))
        self.n_threads = n_threads
        self.fields: Dict[str, Tuple[int, np.dtype, Tuple[int, ...]]] = {}
        name_buf = ctypes.create_string_buffer(256)
        dtype_c, ndim_c = ctypes.c_int(), ctypes.c_int()
        dims = (ctypes.c_int64 * 16)()
        for i in range(int(lib.tbc_n_fields(self._h))):
            lib.tbc_field_info(self._h, i, name_buf, 256, ctypes.byref(dtype_c),
                               ctypes.byref(ndim_c), dims)
            shape = tuple(int(dims[d]) for d in range(ndim_c.value))
            self.fields[name_buf.value.decode()] = (i, np.dtype(_DTYPES[dtype_c.value]), shape)

    def __len__(self) -> int:
        return self.n

    def get_batch(self, indices: Sequence[int], keys: Optional[List[str]] = None) -> Dict[str, np.ndarray]:
        keys = list(self.fields) if keys is None else keys
        n = len(indices)
        idx = (ctypes.c_int64 * n)(*[int(i) for i in indices])
        f_idx = (ctypes.c_int32 * len(keys))(*[self.fields[k][0] for k in keys])
        outs, ptrs = {}, (ctypes.c_void_p * len(keys))()
        for j, k in enumerate(keys):
            _, dtype, shape = self.fields[k]
            arr = np.empty((n,) + shape, dtype=dtype)
            outs[k] = arr
            ptrs[j] = arr.ctypes.data_as(ctypes.c_void_p)
        rc = self._lib.tbc_fill_batch_multi(self._h, idx, n, f_idx, len(keys), ptrs, self.n_threads)
        if rc != 0:
            raise RuntimeError(f"tbc_fill_batch_multi failed: {rc}")
        return outs

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        b = self.get_batch([i])
        return {k: v[0] for k, v in b.items()}

    def close(self):
        if self._h:
            self._lib.tbc_close(self._h)
            self._h = None


class TBCacheLoader:
    """Batched loader over TBCacheDataset (drop-in for data.h5_dataset.DataLoader)."""

    def __init__(self, dataset: TBCacheDataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = False, shard_index: int = 0,
                 num_shards: int = 1):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0
        # multi-host sharding: same epoch permutation on every host, disjoint
        # stride slices, wrap-padded to equal length (see h5_dataset.DataLoader)
        assert 0 <= shard_index < num_shards
        self.shard_index, self.num_shards = shard_index, num_shards

    def _shard_len(self):
        return -(-len(self.ds) // self.num_shards)

    def __len__(self):
        n = self._shard_len()
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        """Pin the shuffle order to an absolute epoch number, so a resumed
        run replays the interrupted epoch's permutation."""
        self.epoch = epoch

    def __iter__(self):
        return self.iter_from(0)

    def iter_from(self, start_batch: int = 0):
        """Iterate from batch `start_batch` without reading skipped records
        (mid-epoch resume skips by index, not by decoding)."""
        idx = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        self.epoch += 1
        from trafficbotsv15_tpu.data.h5_dataset import shard_indices

        idx = shard_indices(idx, self.shard_index, self.num_shards)
        for i in range(start_batch * self.batch_size, len(idx), self.batch_size):
            b = idx[i : i + self.batch_size]
            if self.drop_last and len(b) < self.batch_size:
                break
            yield self.ds.get_batch(b)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "build-lib":
        print(build_lib(force=True))
    elif len(sys.argv) > 1 and sys.argv[1] == "convert":
        # python -m trafficbotsv15_tpu.data.tbcache convert <in.h5> <out.tbcache> [train|val|test]
        from trafficbotsv15_tpu.config import DataCfg
        from trafficbotsv15_tpu.data import h5_dataset as _h5

        split = sys.argv[4] if len(sys.argv) > 4 else "train"
        schema = {
            "train": _h5.tensor_size_train, "val": _h5.tensor_size_val, "test": _h5.tensor_size_test,
        }[split](DataCfg())
        n = convert_h5(sys.argv[2], sys.argv[3], schema)
        print(f"converted {n} episodes -> {sys.argv[3]}")
    else:
        print(__doc__)
