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

import warnings
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


class ShardingFallbackWarning(UserWarning):
    """A per-sample batch leaf was replicated instead of sharded.

    Training still produces correct results (every device computes the
    full batch) but at 1/N efficiency — on a pod this silently erases the
    whole point of data parallelism. Fix: make the global batch size a
    multiple of the mesh's data-axis extent (see docs/POD_RUNBOOK.md)."""


#: env vars whose presence marks a multi-host launch (jax.distributed
#: auto-detects the rest): explicit coordinator, or a Cloud TPU pod task.
#: TPU_WORKER_HOSTNAMES is handled separately — single-host TPU VMs set
#: it too (e.g. "localhost"); only a multi-entry list means a pod.
_DIST_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "CLOUD_TPU_TASK_ID",
    "MEGASCALE_COORDINATOR_ADDRESS",
)


def init_distributed(**kwargs) -> None:
    """Multi-host init (idempotent). On a single host this is a no-op.

    The is-this-multi-host decision must not touch the XLA backend:
    calling e.g. ``jax.process_count()`` first would initialize the local
    backend, after which ``jax.distributed.initialize`` RAISES — and
    swallowing that error would leave a pod silently running N
    independent single-host jobs (divergent models, no error). So:
    initialize iff explicitly parameterized (kwargs) or a coordinator /
    pod launch is visible in the environment, and let real failures
    propagate.
    """
    import os

    if jax.distributed.is_initialized():
        return
    multi_worker = "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if (
        not kwargs
        and not multi_worker
        and not any(v in os.environ for v in _DIST_ENV_VARS)
    ):
        return  # single-host run — nothing to initialize
    jax.distributed.initialize(**kwargs)


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
    leading dim doesn't divide by the mesh size are replicated instead —
    silently for 0/1-D leaves (genuine per-batch constants), with a
    :class:`ShardingFallbackWarning` for per-sample leaves (ndim ≥ 2):
    replicating an image batch trains correctly but at 1/N efficiency,
    which on a pod must never happen without notice.

    Dedup is left to the stdlib ``warnings`` registry (once per distinct
    message under default filters) rather than a module-global set: a
    private set would survive ``simplefilter("error",
    ShardingFallbackWarning)`` and let a must-fail-loudly guard (e.g.
    ``__graft_entry__.dryrun_multichip``) report sharded execution that
    silently fell back — filter changes invalidate the stdlib registry,
    so escalation always fires.
    """
    n = mesh.shape[axis]
    data_sh = batch_sharding(mesh, axis)
    repl_sh = replicated_sharding(mesh)

    def place(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % n == 0 and x.shape[0] >= n:
            return jax.device_put(x, data_sh)
        if getattr(x, "ndim", 0) >= 2:
            warnings.warn(
                f"shard_batch: per-sample leaf with leading dim "
                f"{x.shape[0]} is not divisible by the {n}-device "
                f"'{axis}' mesh axis — REPLICATING it (every device "
                f"computes the full batch, 1/{n} efficiency). Make the "
                f"global batch size a multiple of {n}.",
                ShardingFallbackWarning,
            )
        return jax.device_put(x, repl_sh)

    return jax.tree_util.tree_map(place, batch)


#: leaf names that are per-modality constants, identical on every host
#: (NOT per-sample data) — assembled replicated in multi-host batches.
#: The device_prep collate's descriptors (norm_mean/std/clip, d4) are
#: deliberately NOT here: their VALUES can legitimately differ per host
#: (per-host D4 draws; identity-vs-real normalization when one host's
#: batch resized), so the collate ships them per-sample ([B,·]) and they
#: shard along the batch axis like the image. What must stay
#: host-invariant is batch STRUCTURE — d4-leaf presence (collate mode)
#: and image dtype (trainer unifies to fp32 on pods) — see
#: eovax/data/device_prep.py and stage2._place_prepared.
REPLICATED_BATCH_KEYS = ("wvs",)


def global_batch_from_local(
    batch: Any,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    replicated_keys: tuple[str, ...] = REPLICATED_BATCH_KEYS,
) -> Any:
    """Multi-host: assemble per-process local batches into global arrays.

    Leaves with ndim ≥ 2 are this process's slice of the global batch (the
    data pipeline shards tar shards per host); scalars and leaves named in
    ``replicated_keys`` (the shared ``wvs``) are replicated — every process
    must pass the same value. Any OTHER 1-D leaf is rejected: assembling a
    per-sample vector (labels, sample weights) as "replicated" while hosts
    hold different values would make XLA assume identical contents
    everywhere — silently divergent gradients. Per-sample 1-D data belongs
    in the batch with an explicit trailing axis (``x[:, None]``) or its
    key added to ``replicated_keys`` if it truly is host-invariant.
    """
    data_sh = batch_sharding(mesh, axis)
    repl_sh = replicated_sharding(mesh)

    def place(path, x):
        x = np.asarray(x)
        if x.ndim >= 2:
            return jax.make_array_from_process_local_data(data_sh, x)
        name = getattr(path[-1], "key", None) if path else None
        if x.ndim == 0 or name in replicated_keys:
            return jax.make_array_from_process_local_data(repl_sh, x)
        raise ValueError(
            f"global_batch_from_local: 1-D batch leaf {name!r} is neither "
            f"a known replicated key {replicated_keys} nor image-like; "
            "refusing to guess whether it is per-sample (shard) or "
            "host-invariant (replicate)"
        )

    return jax.tree_util.tree_map_with_path(place, batch)


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
