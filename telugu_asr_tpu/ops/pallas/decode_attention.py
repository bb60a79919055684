"""Prefix-aware single-step attention read for KV-cached decode.

The greedy/beam decode step is HBM-bandwidth-bound on KV-cache reads: with
static shapes, XLA's attention einsum reads the FULL padded cache every step
and masks afterwards, so a decode to cap L pays O(L) reads per step — O(L²)
total — even though step ``s`` only needs ``s+1`` columns.  This kernel DMAs
only the time-tiles that hold live columns, cutting the dominant decode
traffic ~2× on average over a decode (sum s/L vs L per step), more for
short utterances sharing a bucket with long ones.

Layout is the key to DMA efficiency: caches are TILED ``[B, T, H, Dh, 128]``
(T = ceil(L/128) time-tiles) so one tile's slab per batch row is a single
contiguous ``H*Dh*128``-element run (~98 KB for the flagship) — in the plain
``[B, H, Dh, L]`` layout the same copy shatters into 512-byte strided runs
and the DMA engine sits at a fraction of HBM bandwidth (measured ~4× slower
end-to-end).  The minor dims (Dh=32 sublanes × 128 lanes) also tile the
(8,128) VMEM granule exactly, so nothing is padded.  Batch rows are
processed ``rows`` at a time per grid cell and every live tile's copy is
started before the first wait, so copies overlap.

One kernel serves both attention sites of the decoder step
(models/moonshine/decoder.py):

* self-attention: ``n_valid = step+1`` (same for every row), ``key_valid``
  the PAD-token mask law (moonshine/model.py:189 — including the lifted
  PAD-query quirk, see decode/greedy.py);
* cross-attention: ``n_valid = encoder valid length`` per row — shorter
  utterances in a mixed bucket skip their padding tiles entirely (the tile
  count uses the max over the cell's rows).

Numerics match the jnp path (ops/attention.mha_apply): f32 scores,
``-1e9`` masking, f32 softmax; K/V may be float32 or bfloat16 (the
``cache_dtype`` option).  Tail-tile garbage (unloaded VMEM scratch) is
excluded with SELECTs to ``-1e9``/``0`` rather than an additive bias so
stale NaN/Inf bits can never leak through the softmax.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

TILE = 128  # time-tile width (lane dim of each cache tile)
_VMEM_SCRATCH_BUDGET = 10 * 1024 * 1024  # K+V slabs, leave room for blocks

__all__ = [
    "decode_attention",
    "decode_attention_reference",
    "tile_cache",
    "untile_cache",
    "TILE",
]

MASK_BIAS = -1e9


def tile_cache(kv: jnp.ndarray) -> jnp.ndarray:
    """``[B, H, Dh, L] -> [B, L/TILE, H, Dh, TILE]`` (L must divide by TILE)."""
    b, h, dh, l = kv.shape
    assert l % TILE == 0, l
    return kv.reshape(b, h, dh, l // TILE, TILE).transpose(0, 3, 1, 2, 4)


def untile_cache(kv: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`tile_cache`."""
    b, t, h, dh, tile = kv.shape
    return kv.transpose(0, 2, 3, 1, 4).reshape(b, h, dh, t * tile)


def decode_attention_reference(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    n_valid: jnp.ndarray,
    key_valid: Optional[jnp.ndarray] = None,
    *,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """jnp reference/fallback: same math reading the full cache.

    q ``[B, H, Dh]`` f32; k/v tiled ``[B, T, H, Dh, TILE]`` (or plain
    ``[B, H, Dh, L]``); n_valid ``[B]`` int32; key_valid ``[B, L]`` bool.
    Returns ``[B, H, Dh]`` f32.
    """
    if k_cache.ndim == 5:
        k_cache = untile_cache(k_cache)
        v_cache = untile_cache(v_cache)
    b, h, dh = q.shape
    l = k_cache.shape[-1]
    if scale is None:
        scale = 1.0 / (dh ** 0.5)
    valid = jnp.arange(l)[None, :] < n_valid[:, None]
    if key_valid is not None:
        valid = valid & key_valid.astype(bool)
    scores = jnp.einsum(
        "bhd,bhdl->bhl", q.astype(jnp.float32) * scale, k_cache.astype(jnp.float32)
    )
    scores = jnp.where(valid[:, None, :], scores, MASK_BIAS)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhl,bhdl->bhd", probs, v_cache.astype(jnp.float32))


def _kernel(
    n_valid_ref,  # [B] int32 (scalar prefetch, SMEM)
    q_ref,  # [R, H, Dh] VMEM block
    nv_ref,  # [R, 1, 1] int32 VMEM block (n_valid again, for lane masking)
    kv_valid_ref,  # [R, 1, L] int32 VMEM block
    k_hbm,  # [B, T, H, Dh, TILE] ANY/HBM
    v_hbm,  # [B, T, H, Dh, TILE] ANY/HBM
    out_ref,  # [R, H, Dh] VMEM block
    k_scr,  # [R, T, H, Dh, TILE] VMEM scratch (cache dtype)
    v_scr,
    scores_scr,  # [R, H, L] f32 VMEM scratch
    sem,  # DMA sems [T, 2]
    *,
    scale: float,
    max_tiles: int,
    rows: int,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cell = pl.program_id(0)
    row0 = cell * rows
    # tile count for the cell = max prefix over its rows
    m = n_valid_ref[row0]
    for j in range(1, rows):
        m = jnp.maximum(m, n_valid_ref[row0 + j])
    m = jnp.maximum(m, 1)
    n_tiles = (m + TILE - 1) // TILE

    def dmas(i):
        rspan = pl.ds(row0, rows)
        kd = pltpu.make_async_copy(k_hbm.at[rspan, i], k_scr.at[:, i], sem.at[i, 0])
        vd = pltpu.make_async_copy(v_hbm.at[rspan, i], v_scr.at[:, i], sem.at[i, 1])
        return kd, vd

    def start(i):
        @pl.when(i < n_tiles)
        def _():
            kd, vd = dmas(i)
            kd.start()
            vd.start()

    for i in range(max_tiles):  # all live tiles in flight before the first wait
        start(i)

    # the heavy passes over [R, H, Dh, TILE] run ONLY for live tiles — the
    # kernel's cost scales with the prefix, which is the whole point (an
    # unconditional full-L version measured flat ~74 us regardless of n)
    q = q_ref[:].astype(jnp.float32) * scale  # [R, H, Dh]
    scores_scr[:] = jnp.full(scores_scr.shape, MASK_BIAS, jnp.float32)
    out_ref[:] = jnp.zeros(out_ref.shape, jnp.float32)

    _, h, l = scores_scr.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (h, l), 1)[None]  # [1, H, L]
    valid = (col < nv_ref[:]) & (kv_valid_ref[:] > 0)  # → [R, H, L]

    for t in range(max_tiles):
        @pl.when(t < n_tiles)
        def _(t=t):
            kd, vd = dmas(t)
            kd.wait()
            k_t = k_scr[:, t].astype(jnp.float32)  # [R, H, Dh, TILE]
            s_t = jnp.sum(q[:, :, :, None] * k_t, axis=2)  # [R, H, TILE]
            valid_t = valid[:, :, t * TILE : (t + 1) * TILE]
            scores_scr[:, :, t * TILE : (t + 1) * TILE] = jnp.where(
                valid_t, s_t, MASK_BIAS
            )
            vd.wait()

    scores = scores_scr[:]
    mx = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - mx)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)

    for t in range(max_tiles):
        @pl.when(t < n_tiles)
        def _(t=t):
            p_t = probs[:, :, t * TILE : (t + 1) * TILE]  # [R, H, TILE]
            valid_t = valid[:, :, t * TILE : (t + 1) * TILE]
            # zero masked V lanes: probs there are 0 but 0 * stale-NaN is NaN
            v_t = jnp.where(
                valid_t[:, :, None, :], v_scr[:, t].astype(jnp.float32), 0.0
            )
            out_ref[:] += jnp.sum(p_t[:, :, None, :] * v_t, axis=-1)


def _rows_per_cell(batch: int, h: int, dh: int, l: int, itemsize: int) -> int:
    per_row = h * dh * l * itemsize * 2  # K + V slabs
    rows = max(1, _VMEM_SCRATCH_BUDGET // per_row)
    while batch % rows:
        rows -= 1
    return min(rows, batch)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _decode_attention_pallas(q, k_cache, v_cache, n_valid, key_valid, *, scale, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, h, dh = q.shape
    max_tiles = k_cache.shape[1]
    l = max_tiles * TILE
    rows = _rows_per_cell(batch, h, dh, l, k_cache.dtype.itemsize)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch // rows,),
        in_specs=[
            pl.BlockSpec((rows, h, dh), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1, 1), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1, l), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # K cache stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # V cache stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (rows, h, dh), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, max_tiles, h, dh, TILE), k_cache.dtype),
            pltpu.VMEM((rows, max_tiles, h, dh, TILE), v_cache.dtype),
            pltpu.VMEM((rows, h, l), jnp.float32),
            pltpu.SemaphoreType.DMA((max_tiles, 2)),
        ],
    )
    n_valid = n_valid.astype(jnp.int32)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, max_tiles=max_tiles, rows=rows),
        out_shape=jax.ShapeDtypeStruct((batch, h, dh), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        n_valid,
        q.astype(jnp.float32),
        n_valid.reshape(batch, 1, 1),
        key_valid.astype(jnp.int32).reshape(batch, 1, l),
        k_cache,
        v_cache,
    )


def decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    n_valid: jnp.ndarray,
    key_valid: Optional[jnp.ndarray] = None,
    *,
    scale: Optional[float] = None,
    use_pallas: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-query attention over a TILED KV cache ``[B, T, H, Dh, TILE]``,
    reading only the tiles covering each row's ``n_valid`` prefix (see
    module docstring)."""
    b, h, dh = q.shape
    if not use_pallas or k_cache.ndim != 5:
        return decode_attention_reference(
            q, k_cache, v_cache, n_valid, key_valid, scale=scale
        )
    if scale is None:
        scale = 1.0 / (dh ** 0.5)
    if key_valid is None:
        key_valid = jnp.ones((b, k_cache.shape[1] * TILE), jnp.int32)
    return _decode_attention_pallas(
        q, k_cache, v_cache, n_valid, key_valid, scale=float(scale), interpret=interpret
    )
