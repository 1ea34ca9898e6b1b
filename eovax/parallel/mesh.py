"""Device mesh + sharding rules — the framework's entire "distributed
communication backend".

The reference's parallelism is Lightning DDP over NCCL with
webdataset-level data sharding (SURVEY.md §2.4): data parallelism only, at
~10⁸ params. The TPU-native equivalent is this module: a 1-D ``data`` mesh,
parameters replicated, batches sharded on axis 0, and XLA emitting the
gradient ``psum`` over ICI from the shardings — no hand-written
collectives.

Multi-host: ``init_distributed`` wraps ``jax.distributed.initialize``; the
data pipeline shards shards per host via ``jax.process_index()``
(eovax.data), the mesh spans all global devices, and batch arrays are
assembled with ``jax.make_array_from_process_local_data``.

BatchNorm note: with the batch sharded over ``data``, the latent-BN batch
statistics computed inside jit are **global** (XLA inserts the
cross-replica reduction) — sync-BN semantics, which faithfully matches the
reference's single-device full-batch statistics (SURVEY.md §5).

TP/PP/SP/EP are **non-goals** (SURVEY.md §2.4): no weight dimension of
this model family warrants them; attention is ≤16k tokens even at 1024².
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed(**kwargs) -> None:
    """Multi-host init (idempotent). On a single host this is a no-op."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # Single-process run without coordinator env — fine.
        pass


def make_mesh(devices: list | None = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard axis 0 of array leaves across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place a pytree fully replicated on the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Place a host-local batch pytree sharded on axis 0.

    Scalars / per-batch vectors (e.g. the shared ``wvs`` vector) whose
    leading dim doesn't divide by the mesh size are replicated instead.
    """
    n = mesh.shape[axis]
    data_sh = batch_sharding(mesh, axis)
    repl_sh = replicated_sharding(mesh)

    def place(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % n == 0 and x.shape[0] >= n:
            return jax.device_put(x, data_sh)
        return jax.device_put(x, repl_sh)

    return jax.tree_util.tree_map(place, batch)


def global_batch_from_local(batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Multi-host: assemble per-process local batches into global arrays.

    Image-like leaves (ndim ≥ 2) are treated as this process's slice of the
    global batch (the data pipeline shards tar shards per host, so each
    host's batch is already its local portion); small vectors/scalars (the
    shared ``wvs``) are replicated — every process passes the same value.
    """
    data_sh = batch_sharding(mesh, axis)
    repl_sh = replicated_sharding(mesh)

    def place(x):
        x = np.asarray(x)
        if x.ndim >= 2:
            return jax.make_array_from_process_local_data(data_sh, x)
        return jax.make_array_from_process_local_data(repl_sh, x)

    return jax.tree_util.tree_map(place, batch)


def local_numpy(x) -> np.ndarray:
    """Host-local numpy view of a (possibly multi-host-sharded) array.

    `np.asarray` / `jax.device_get` on an array whose shards span other
    processes' devices raises ("spans non-addressable devices"); this
    concatenates only THIS process's addressable shards along axis 0 —
    exactly the host's local portion of a `place_batch`-sharded batch.
    Fully-addressable arrays pass straight through.
    """
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if x.is_fully_addressable:
        return np.asarray(jax.device_get(x))
    shards = x.addressable_shards
    if shards[0].data.shape == x.shape:
        # replicated: every shard holds the full array — return one copy
        return np.asarray(shards[0].data)
    if any(
        idx != slice(None) for s in shards for idx in s.index[1:]
    ):
        raise NotImplementedError(
            "local_numpy only supports arrays sharded along axis 0 "
            "(dedupe keys on s.index[0].start; a non-leading split would "
            "silently drop shards)"
        )
    by_start = {}
    for s in shards:  # dedupe axis-0 ranges (replication within a range)
        by_start.setdefault(s.index[0].start or 0, s.data)
    return np.concatenate(
        [np.asarray(by_start[k]) for k in sorted(by_start)], axis=0
    )


def place_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Put a host batch onto the mesh, multi-host aware.

    Single process: shard the full batch across local devices
    (:func:`shard_batch`). Multi-process (jax.distributed initialized):
    each host contributes its per-host batch as the local shard of a
    global array (:func:`global_batch_from_local`) — the reference's
    ``wds.split_by_node`` + DDP feeding (terramesh.py:384-385)."""
    if jax.process_count() > 1:
        return global_batch_from_local(batch, mesh, axis)
    return shard_batch(batch, mesh, axis)
