"""Device mesh and sharding rules.

The reference scales with PyTorch-Lightning DDP over NCCL (run.py:50-52);
here the equivalent is GSPMD data parallelism: one `jax.sharding.Mesh` with a
"data" axis over ICI, the batch (scenario) dimension sharded across it, and
parameters replicated. XLA inserts the gradient all-reduce (psum) during the
backward pass — no explicit collectives needed in user code. The WOSAC
joint-future replication (batch x 32) rides the same axis: futures are
flattened into the scenario dim before sharding, so rollout replicas spread
across chips.

Extension axes (model/pipeline) are declared here so larger configs can shard
hidden dims later without touching call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed on multi-host TPU slices (idempotent).

    Single-host (and this image's single-chip tunnel) is a no-op. On a pod
    slice, call before any jax API on every worker; the TPU environment
    provides coordinator discovery.
    """
    import os

    multi_host = any(
        os.environ.get(k) for k in ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS")
    )
    if not multi_host:
        return False
    try:
        jax.distributed.initialize()
        return True
    except (RuntimeError, ValueError):
        return False  # already initialized or single-process


def order_devices_for_slices(devices: Sequence, slice_ids: Sequence[int], n_model: int):
    """Order devices slice-major for a hybrid ICI x DCN mesh.

    Multi-slice TPU jobs (e.g. two v5e-256 pods over DCN) must keep the model
    axis — and the fast share of data-parallel — INSIDE a slice, with the
    slice group as the outer blocks of the data axis, so the gradient psum
    decomposes into per-slice ICI all-reduces plus one small DCN all-reduce
    of partials (the scaling-book hybrid-mesh recipe). Returns the reordered
    device list (truncated so every slice contributes the same count,
    divisible by n_model) and the resulting data-axis size.
    """
    groups = {}
    for d, s in zip(devices, slice_ids):
        groups.setdefault(s, []).append(d)
    per = min(len(g) for g in groups.values())
    per -= per % max(n_model, 1)
    if per == 0:
        raise ValueError(
            f"no usable devices: smallest slice has {min(len(g) for g in groups.values())} "
            f"device(s), fewer than n_model={n_model} — shrink the model axis or "
            f"exclude the undersized slice ({ {s: len(g) for s, g in groups.items()} })"
        )
    dropped = len(devices) - per * len(groups)
    if dropped:
        import warnings

        warnings.warn(
            f"uneven slices: truncating every slice to {per} devices, dropping "
            f"{dropped} of {len(devices)} ({ {s: len(g) for s, g in groups.items()} }) "
            "— the job will train on less hardware than provisioned",
            stacklevel=2,
        )
    order = [d for s in sorted(groups) for d in groups[s][:per]]
    return order, len(groups) * (per // max(n_model, 1))


def make_mesh(n_data: Optional[int] = None, n_model: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """Create a (data, model) mesh. Defaults to all devices on the data axis.

    Multi-slice jobs (devices exposing distinct `slice_index`, i.e. DCN-
    connected pods) are ordered slice-major via order_devices_for_slices so
    the model axis never crosses DCN and collectives ride ICI within each
    slice. Single-slice (and this image's single chip / virtual CPU mesh)
    takes the plain reshape path.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    slice_ids = [getattr(d, "slice_index", 0) or 0 for d in devices]
    if len(set(slice_ids)) > 1:
        devices, auto_n_data = order_devices_for_slices(devices, slice_ids, n_model)
        if n_data is None:
            n_data = auto_n_data
    elif n_data is None:
        n_data = len(devices) // n_model
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (scenario) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(x, sharding: NamedSharding):
    """Place one host array onto a (possibly multi-process) sharding.

    Fully-addressable shardings (single process, or a host-LOCAL eval mesh on
    a multi-host job): plain device_put. A global multi-process sharding: the
    host array is this process's shard of the global batch (each host loads a
    DISJOINT dataset shard, the reference's DistributedSampler semantics) and
    the global array is assembled from the per-process pieces without any
    cross-host transfer (`jax.make_array_from_process_local_data` maps the
    local rows onto the process's addressable devices, whatever their mesh
    order)."""
    import numpy as np

    x = np.asarray(x)
    if jax.process_count() == 1 or sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict onto the mesh, scenario dim sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: put_global(x, sh), batch)


def put_replicated(x, sharding: NamedSharding):
    """device_put onto a (possibly multi-process) replicated/param sharding.

    Multi-process with a device-resident source would need a cross-host
    transfer (CPU backends reject it; on TPU it would ride DCN): materialize
    to host first — every process holds the full replicated value, so the put
    becomes process-local. A non-addressable SHARDED source (fsdp/tp params
    entering eval on a multi-host job) cannot be np.asarray'd directly; it is
    gathered first (process_allgather is a collective — callers map it over
    pytrees in identical order on every rank, which tree_map guarantees)."""
    import numpy as np

    if jax.process_count() > 1 and (
        not sharding.is_fully_addressable or not getattr(x, "is_fully_addressable", True)
    ):
        if (hasattr(x, "is_fully_addressable") and not x.is_fully_addressable
                and not x.is_fully_replicated):
            from jax.experimental import multihost_utils

            x = multihost_utils.process_allgather(x, tiled=True)
        x = np.asarray(x)
    return jax.device_put(x, sharding)


def fsdp_shard_params(params, mesh: Mesh, min_size: int = 2**14):
    """ZeRO/FSDP-style parameter sharding: split each large parameter's
    largest axis across the data axis; XLA all-gathers it at use and
    reduce-scatters gradients. Small tensors stay replicated. The 10M flagship
    fits replicated; this is the scaling path for scaled_config and beyond."""
    n_data = mesh.shape[DATA_AXIS]

    def shard_one(p):
        if p.size < min_size:
            return put_replicated(p, NamedSharding(mesh, P()))
        dims = list(p.shape)
        for axis in sorted(range(len(dims)), key=lambda a: -dims[a]):
            if dims[axis] % n_data == 0:
                spec = [None] * len(dims)
                spec[axis] = DATA_AXIS
                return put_replicated(p, NamedSharding(mesh, P(*spec)))
        return put_replicated(p, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(shard_one, params)


def tp_shard_params(params, mesh: Mesh):
    """Tensor-parallel (megatron-style) parameter sharding over the MODEL axis.

    Column-parallel projections (q/kv/rpe/ffn1: hidden -> wider) shard their
    output dim; row-parallel ones (out_proj/ffn2: wider -> hidden) shard their
    input dim. With GSPMD that is all that is needed — XLA propagates the
    shardings through the matmuls and inserts the all-gather/reduce-scatter
    collectives on the model axis. Everything else (LayerNorm scales, biases
    of row-parallel layers, embeddings) stays replicated.

    Used by scaled_config-and-beyond models whose hidden dims outgrow one
    chip; the flagship 10M model runs pure data-parallel."""
    n_model = mesh.shape[MODEL_AXIS]
    # (name, axis-to-shard): column-parallel = output dim 1, row-parallel = input
    # dim 0. Column-parallel biases shard with their kernels (kv_b/rpe_proj_b
    # are separate explicit params, so they are listed by name; q_proj/ffn1 are
    # Dense submodules whose bias shares the module path). Note the [D, 2D]
    # fused kv_w shards its 2D output axis in contiguous column ranges, which
    # splits the k-half/v-half (not head-major) across devices — GSPMD keeps it
    # correct and at n_model=2 the split lands exactly on the k/v boundary; a
    # head-major layout would need an un-fused [D, 2, n_head, d_head] param
    # shape (a checkpoint-breaking change, not worth it at current scales).
    col = ("q_proj", "kv_w", "kv_b", "rpe_proj_w", "rpe_proj_b", "ffn1")
    row = ("out_proj", "ffn2")

    def shard_one(path, p):
        keys = [getattr(k, "key", str(k)) for k in path]
        spec = [None] * p.ndim
        if p.ndim >= 1 and any(c in n for n in keys for c in col):
            axis = p.ndim - 1  # output dim (kernels AND their biases)
            if p.shape[axis] % n_model == 0:
                spec[axis] = MODEL_AXIS
        elif p.ndim >= 2 and any(r in n for n in keys for r in row):
            if p.shape[0] % n_model == 0:
                spec[0] = MODEL_AXIS
        return put_replicated(p, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map_with_path(shard_one, params)


def device_prefetch(iterator, sharding, depth: int = 2, skip_keys=("scenario_bytes",)):
    """Overlap host->device transfer with compute: keep `depth` batches in
    flight on the device (the pin_memory/prefetch role of the reference's
    DataLoader, data_h5_womd.py:206-216)."""
    import collections

    queue = collections.deque()

    def put(b):
        return {
            k: put_global(v, sharding)
            for k, v in b.items()
            if k not in skip_keys and not isinstance(v, list)
        }

    it = iter(iterator)
    try:
        for _ in range(depth):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out


def pad_batch_to_devices(batch, n_devices: int):
    """Pad the scenario dim so it divides the data-axis size (padded scenarios
    have all-invalid agents and contribute nothing to sums)."""
    import numpy as np

    n_sc = next(iter(batch.values())).shape[0]
    rem = n_sc % n_devices
    if rem == 0:
        return batch, n_sc
    pad = n_devices - rem

    def _pad(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), widths)

    return {k: _pad(v) for k, v in batch.items()}, n_sc
