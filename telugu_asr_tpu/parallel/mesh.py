"""Device mesh and sharding helpers — the framework's distribution layer.

The reference's only parallelism is synchronous mirrored data parallelism via
``tf.distribute`` (SURVEY §2.2, env_util.py:36-40).  The TPU-native
equivalent: a 1-D ``jax.sharding.Mesh`` over the ``data`` axis, batches
sharded along it, parameters replicated, and the jitted train step letting
XLA insert the gradient ``psum`` over ICI.  The mesh generalizes to more axes
(``("data", "model")``) for larger models; at 3.26M params only ``data`` is
profitable, but the API carries the axes through.

Multi-host (DCN) extension: call ``jax.distributed.initialize()`` before
``make_mesh()`` — ``jax.devices()`` then spans hosts and the same code runs.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "pad_batch_to_multiple",
]


def make_mesh(
    axis_names: Sequence[str] = ("data",),
    axis_sizes: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = [len(devices)] + [1] * (len(axis_names) - 1)
    mesh_devices = np.asarray(devices).reshape(tuple(axis_sizes))
    return Mesh(mesh_devices, tuple(axis_names))


def batch_sharding(mesh: Mesh, batch_axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, PartitionSpec(batch_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(mesh: Mesh, batch: dict, batch_axis: str = "data") -> dict:
    """Device-put every array in a batch dict with batch-axis sharding."""
    sharding = batch_sharding(mesh, batch_axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def pad_batch_to_multiple(batch: dict, multiple: int, pad_id: int = 2) -> tuple[dict, int]:
    """Pad the batch dimension so it divides the mesh's data axis.

    Extra rows are zero audio / PAD text; returns (padded batch, real rows).
    """
    sizes = {x.shape[0] for x in jax.tree_util.tree_leaves(batch)}
    assert len(sizes) == 1, sizes
    n = sizes.pop()
    if n % multiple == 0:
        return batch, n
    pad = multiple - (n % multiple)

    def pad_leaf(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        value = pad_id if np.issubdtype(np.asarray(x).dtype, np.integer) else 0
        return np.pad(np.asarray(x), widths, constant_values=value)

    return jax.tree_util.tree_map(pad_leaf, batch), n
