"""Device mesh and sharding helpers.

The reference has no multi-device training at all (SURVEY §2.4); the TPU
framework's distributed story is jax-native: a 1-D ``dp`` mesh over which the
batch of cloud pairs is sharded, with parameters/optimizer state replicated.
XLA inserts the gradient psum automatically when the jitted train step
consumes sharded batches and produces replicated parameter updates.

The same code path runs single-chip (mesh of one device) and on pods; tests
exercise it on a virtual 8-device CPU mesh.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicate_sharding", "shard_batch",
           "put_replicated", "allgather_host", "allgather_host_f64",
           "allgather_host_strings"]

BATCH_AXIS = "dp"


def _check_process_major(devices) -> None:
    """``allgather_host`` pairs ``process_allgather`` rows (process-index
    order) with device-sharded batches (mesh device order); that only lines
    up when the mesh's devices are process-major.  True for meshes built
    from ``jax.devices()`` on every current runtime, but assert rather than
    silently mis-pair host metadata with model outputs on an exotic
    topology."""
    procs = [getattr(d, "process_index", 0) for d in np.asarray(devices).flat]
    if any(b < a for a, b in zip(procs, procs[1:])):
        raise AssertionError(
            "Mesh device order is not process-major "
            f"(process indices {procs}); allgather_host would pair "
            "per-sample host metadata with the wrong device shards. "
            "Order the devices by process_index when building the mesh."
        )


def make_mesh(devices: Optional[Sequence] = None, axis: str = BATCH_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    _check_process_major(devices)
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_for_batch(batch_size: int, devices: Optional[Sequence] = None,
                        axis: str = BATCH_AXIS) -> Mesh:
    """Largest data-parallel mesh whose size divides the batch size."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    _check_process_major(devices[:n])
    return Mesh(np.asarray(devices[:n]), (axis,))


def batch_sharding(mesh: Mesh, axis: str = BATCH_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated placement (params, optimizer state)."""
    return NamedSharding(mesh, P())


def _spans_processes(mesh: Mesh) -> bool:
    local = {d.id for d in jax.local_devices()}
    return any(d.id not in local for d in mesh.devices.flat)


def shard_batch(batch: dict, mesh: Mesh, axis: str = BATCH_AXIS) -> dict:
    """Device-put every array in a batch dict with its batch axis sharded.

    Non-array entries (names, timestamps kept host-side) pass through.
    On a multi-host mesh each process holds its local slice of the global
    batch (the loader's per-host shard); the global array is assembled with
    ``jax.make_array_from_process_local_data`` — no cross-host data motion.
    """
    sharding = batch_sharding(mesh, axis)
    multihost = _spans_processes(mesh)

    def put(x):
        if isinstance(x, (np.ndarray, jax.Array)) and getattr(x, "ndim", 0) >= 1:
            if multihost:
                return jax.make_array_from_process_local_data(
                    sharding, np.asarray(x)
                )
            return jax.device_put(x, sharding)
        return x

    return {k: put(v) for k, v in batch.items()}


def allgather_host(values: np.ndarray) -> np.ndarray:
    """Concatenate per-process host arrays in process-index order.

    Row order matches the global batch built by ``shard_batch``
    (``jax.make_array_from_process_local_data`` lays shards out in mesh
    device order, which is process-major for meshes built from
    ``jax.devices()``), so host-side per-sample metadata gathered here
    lines up with device-gathered model outputs.  Single-process: identity.
    """
    if jax.process_count() == 1:
        return np.asarray(values)
    from jax.experimental import multihost_utils

    out = np.asarray(multihost_utils.process_allgather(np.asarray(values)))
    return out.reshape((-1,) + np.asarray(values).shape[1:])


def allgather_host_f64(values: np.ndarray) -> np.ndarray:
    """Allgather float64 host values bit-exactly.

    ``allgather_host`` rides a device collective; with jax x64 disabled
    (the TPU default) a float64 array would silently downcast to float32
    (~128 s resolution for epoch timestamps).  Transport the raw bits as
    two uint32 halves instead and reassemble."""
    vals = np.ascontiguousarray(np.asarray(values, dtype=np.float64))
    if jax.process_count() == 1:
        return vals
    halves = vals.view(np.uint32).reshape(vals.shape + (2,))
    out = allgather_host(halves)
    return out.reshape(-1, 2).view(np.float64).reshape(
        (-1,) + vals.shape[1:])


def allgather_host_strings(names, width: int = 96) -> list:
    """Allgather a per-process list of strings (fixed-width UTF-8 ride on
    the device collective; names longer than ``width`` bytes truncate)."""
    if jax.process_count() == 1:
        return [str(n) for n in names]
    enc = np.zeros((len(names), width), dtype=np.uint8)
    for i, n in enumerate(names):
        b = str(n).encode("utf-8")[:width]
        enc[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
    out = allgather_host(enc)
    return [bytes(row[row != 0]).decode("utf-8", errors="replace")
            for row in out]


def put_replicated(tree, mesh: Mesh):
    """Place a host pytree fully replicated over the mesh (multi-host safe:
    every process carries the full value, e.g. params/optimizer state)."""
    sharding = replicate_sharding(mesh)
    if not _spans_processes(mesh):
        return jax.device_put(tree, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )
