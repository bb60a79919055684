"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh axis.

The reference has no pipeline parallelism (SURVEY §2.2 — at 3.26M params no
model-axis strategy is profitable), but the mesh API carries the axes; like
``tp_param_sharding`` (mesh.py), this makes the ``stage`` axis a REAL,
numerically-verified code path rather than API surface, and it is the shape
pipelining takes on TPU pods: stages mapped to devices along a mesh axis,
activations moved stage→stage with ``lax.ppermute`` over ICI, microbatches
keeping every stage busy outside the fill/drain bubble.

Scope: a stack of HOMOGENEOUS blocks (same function, per-block params — the
Moonshine/Conformer encoder shape).  Stage ``s`` owns ``num_blocks / S``
consecutive blocks (param leaves stacked on a leading block axis and sharded
over ``stage``); the batch is split into ``M`` microbatches; a ``lax.scan``
over ``M + S - 1`` ticks runs one stage-step per tick and rotates activations
with a ring ``ppermute``.  The last stage accumulates outputs; a final
``psum`` over the stage axis (all other stages contribute zeros) replicates
the result.  Differentiable end to end — ``jax.grad`` through the scan +
``ppermute`` yields the reverse-ring backward pipeline automatically, so the
same helper serves training.

Composes with data parallelism: pass ``batch_axis="data"`` on a
``("data", "stage")`` mesh and each microbatch's rows stay sharded over
``data`` while activations ride the ``stage`` ring (blocks apply row-wise, so
the two axes never interact).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["stack_block_params", "pipeline_blocks"]


def stack_block_params(blocks: list) -> Any:
    """Stack a list of identically-shaped per-block param pytrees along a new
    leading block axis (the axis ``pipeline_blocks`` shards over stages)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def pipeline_blocks(
    mesh: Mesh,
    block_fn: Callable[[Any, jnp.ndarray, Any], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    aux: Any = None,
    *,
    n_microbatches: int,
    stage_axis: str = "stage",
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Apply ``num_blocks`` blocks sequentially, pipelined over ``stage_axis``.

    Equivalent to ``for i in range(NB): x = block_fn(params_i, x, aux)`` with
    the blocks spread over the mesh's ``stage_axis`` (NB must divide evenly)
    and the batch split into ``n_microbatches`` along axis 0 (must divide the
    batch).  ``aux`` is an optional pytree of per-example arrays (e.g. a
    padding mask ``[B, T]``) passed to every block alongside its microbatch.
    Blocks must preserve the activation shape (residual stacks do).

    Returns the pipelined output, bitwise-equal to the sequential loop up to
    float reassociation (tested exact on CPU meshes).
    """
    n_stages = mesh.shape[stage_axis]
    leaves = jax.tree_util.tree_leaves(stacked_params)
    num_blocks = leaves[0].shape[0]
    if num_blocks % n_stages:
        raise ValueError(f"{num_blocks} blocks over {n_stages} stages")
    blocks_per_stage = num_blocks // n_stages
    batch = x.shape[0]
    if batch % n_microbatches:
        raise ValueError(f"batch {batch} / {n_microbatches} microbatches")
    mb = batch // n_microbatches
    m = n_microbatches

    aux = {} if aux is None else aux
    xm = x.reshape(m, mb, *x.shape[1:])
    auxm = jax.tree_util.tree_map(
        lambda a: a.reshape(m, mb, *a.shape[1:]), aux
    )
    params_staged = jax.tree_util.tree_map(
        lambda p: p.reshape(n_stages, blocks_per_stage, *p.shape[1:]),
        stacked_params,
    )

    data_spec = P(None, batch_axis)  # [M, mb, ...]: microbatch rows over data

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(stage_axis), data_spec, data_spec),
        out_specs=data_spec,
        check_vma=False,
    )
    def run(params, xm, auxm):
        sidx = jax.lax.axis_index(stage_axis)
        params = jax.tree_util.tree_map(lambda p: p[0], params)  # local stage
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, t):
            h, out = carry
            # stage 0 injects microbatch t (clamped: post-drain ticks feed
            # garbage that the last stage never writes); later stages take
            # the activation the ring delivered last tick
            h_in = jnp.where(sidx == 0, xm[jnp.clip(t, 0, m - 1)], h)
            a_t = jax.tree_util.tree_map(
                lambda a: a[jnp.clip(t - sidx, 0, m - 1)], auxm
            )
            h_out = h_in
            for j in range(blocks_per_stage):
                bp = jax.tree_util.tree_map(lambda p: p[j], params)
                h_out = block_fn(bp, h_out, a_t)
            # the last stage finishes microbatch t-(S-1) at tick t
            widx = t - (n_stages - 1)
            write = (sidx == n_stages - 1) & (widx >= 0)
            wclip = jnp.clip(widx, 0, m - 1)
            cur = jax.lax.dynamic_index_in_dim(out, wclip, 0, keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(write, h_out, cur), wclip, 0
            )
            h_next = jax.lax.ppermute(h_out, stage_axis, perm)
            return (h_next, out), None

        h0 = jnp.zeros_like(xm[0])
        out0 = jnp.zeros_like(xm)
        (_, out), _ = jax.lax.scan(
            tick, (h0, out0), jnp.arange(m + n_stages - 1)
        )
        # only the last stage wrote anything; psum replicates it to all
        return jax.lax.psum(out, stage_axis)

    y = run(params_staged, xm, auxm)
    return y.reshape(batch, *x.shape[1:])
