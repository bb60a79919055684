"""Device mesh and sharding helpers — the framework's distribution layer.

The reference's only parallelism is synchronous mirrored data parallelism via
``tf.distribute`` (SURVEY §2.2, env_util.py:36-40).  The TPU-native
equivalent: a 1-D ``jax.sharding.Mesh`` over the ``data`` axis, batches
sharded along it, parameters replicated, and the jitted train step letting
XLA insert the gradient ``psum`` over ICI.  The mesh generalizes to more axes
(``("data", "model")``) for larger models; at 3.26M params only ``data`` is
profitable, but the API carries the axes through.

Multi-host (DCN) extension: call :func:`distributed_initialize` (a thin
``jax.distributed.initialize`` wrapper) before ``make_mesh()`` —
``jax.devices()`` then spans hosts and the same mesh/step code runs; use
:func:`make_global_batch` / :func:`make_global_replicated` to lift each
process's local data into global arrays (every process holds only its
addressable shards).  Exercised by a real 2-process CPU cluster in
``tests/test_multihost.py``.
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
    "distributed_initialize",
    "make_global_batch",
    "make_global_replicated",
    "tp_param_sharding",
]


def distributed_initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join (or auto-detect) a multi-process JAX cluster.

    The analog of the reference's ``MultiWorkerMirroredStrategy`` bring-up
    (env_util.py:36-40): on TPU pods the arguments are auto-detected from the
    environment; on CPU/GPU clusters pass them explicitly.  After this,
    ``jax.devices()`` spans all processes and the DP mesh/step code is
    unchanged.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_batch(mesh: Mesh, local_batch: dict, batch_axis: str = "data") -> dict:
    """Lift per-process batch shards into global batch-sharded arrays.

    Each process passes ITS rows (global_batch / num_processes of them, in
    process order); the result is a pytree of global arrays sharded over
    ``batch_axis`` usable by the jitted steps.  Single-process: equivalent to
    :func:`shard_batch`.
    """
    sharding = batch_sharding(mesh, batch_axis)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch,
    )


def make_global_replicated(mesh: Mesh, tree):
    """Replicate a host pytree (params/opt state) across every mesh device.

    Every process must pass the SAME values (e.g. params built from the same
    PRNG seed, or restored from the same checkpoint).
    """
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x), global_shape=np.shape(x)
        ),
        tree,
    )


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


def tp_param_sharding(mesh: Mesh, tree, model_axis: str = "model"):
    """Megatron-style tensor-parallel shardings for a param-shaped pytree.

    Returns a pytree of ``NamedSharding`` matching ``tree``: FFN dense1
    kernels ``[D, H]`` split output channels over ``model_axis`` (biases
    with them), dense2 kernels ``[H, D]`` split input rows, and the
    classifier splits the vocab dim; everything else (attention, norms,
    embeddings) is replicated.  GSPMD propagates the layouts and inserts
    whatever collectives the computation needs — for a plain-activation FFN
    that is the classic Megatron psum after dense2; for SwiGLU the
    value/gate halves of the single fused dense1 kernel land on different
    shards, so the gating product costs an extra resharding collective
    (splitting dense1 into two kernels would make it shard-local; not done
    — the fused-kernel layout is load-bearing for the decode path).  The
    rules are PATH-based (``ffn/dense1``, ``ffn/dense2``, ``classifier``),
    so the same function shards the optimizer moments of a ``TrainState`` —
    Adam's ``mu``/``nu`` mirror the param paths.

    At the flagship 3.26M params TP is not profitable (SURVEY §2.2) — this
    exists so the mesh's ``model`` axis is a REAL, numerically-verified
    code path (``tests/test_parallel.py``: TP×DP step == DP-only step),
    not just API surface, and scales to larger models unchanged.
    """

    def name(entry) -> str:
        for attr in ("key", "name", "idx"):
            if hasattr(entry, attr):
                return str(getattr(entry, attr))
        return str(entry)

    def rule(path, leaf) -> PartitionSpec:
        names = [name(p) for p in path]
        nd = getattr(leaf, "ndim", 0)
        if "ffn" in names and "dense1" in names:
            return PartitionSpec(None, model_axis) if nd == 2 else (
                PartitionSpec(model_axis) if nd == 1 else PartitionSpec())
        if "ffn" in names and "dense2" in names:
            return PartitionSpec(model_axis, None) if nd == 2 else PartitionSpec()
        if "classifier" in names:
            return PartitionSpec(None, model_axis) if nd == 2 else (
                PartitionSpec(model_axis) if nd == 1 else PartitionSpec())
        return PartitionSpec()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, rule(path, leaf)), tree
    )


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
