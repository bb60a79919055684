"""Whole-decode-loop fused Pallas kernel for the Moonshine greedy decoder.

ONE kernel launch runs the ENTIRE greedy decode (`decode/greedy.py`): the
token `while_loop`, embedding lookup, all decoder blocks (RoPE MHA over a KV
cache, cross-attention, SwiGLU FFN, post-LN), the classifier, argmax and the
EOS/PAD bookkeeping — per reference semantics (src/models/moonshine/
model.py:165-229, re-expressed as the cached single-step loop).

Why: the decode loop is the serving bottleneck and is HBM-bandwidth-bound.
The XLA step re-reads every block's full KV cache (self + cross) from HBM on
every step (~75 MB/step for the B=64 flagship bucket — measured 452 µs/step
f32, 268 µs/step bf16 on v5e), and splitting the step into per-site Pallas
calls pays ~58 µs launch/sync overhead per call (ops/pallas/
decode_attention.py).  This kernel keeps EVERYTHING resident in VMEM for a
group of batch rows — weights loaded once, KV caches live in VMEM scratch
across all steps (v5e has ~128 MB of VMEM; the flagship B=64 cell uses
~75 MB) — so the steady state reads NO HBM at all and there is exactly one
kernel launch per batch.

Microarchitecture notes (v5e, Mosaic — numbers from in-kernel micro-probes):

* Loop/branch iterations with VECTOR carries cost ~1.5 µs each, so the inner
  attention runs as STRAIGHT-LINE code over static 32-column segments, each
  wrapped in one `lax.cond` on prefix liveness; only the outer decode step
  is a `while_loop` (scalar-dominated carries: ~20 ns/iter overhead).
* Caches are TIME-MAJOR-OUTERMOST ``[blocks, L, R, D]``: Mosaic requires
  dynamically-indexed stores to index only MAJOR dims, and the per-step
  column write lands at a traced step index.
* Scores are computed INFLATED ``[SEG, R, D]`` (each head's score replicated
  across its head_dim lanes), which makes masking, exp and the probs·V
  accumulation purely elementwise with cheap static major-dim trees.  The
  head-group reduction (and simultaneous re-broadcast) is ONE MXU matmul
  against a block-diagonal matrix of ones — lane-roll reduction trees
  measured ~10× slower.  The matmul is split at 128-lane-tile boundaries
  (off-diagonal quadrants of the ones matrix are all zero), halving its
  cost; requires ``128 % head_dim == 0``.
* ``precise_scores=True`` (default) keeps the f32 MXU path for the
  head-sum, which is EXACT for this reduction (every product is × 1.0);
  ``False`` rounds the q·k products to bfloat16 first — ~4% faster
  end-to-end, for serving configs that already run bf16 caches.
* RoPE's interleaved rotate-half is two lane rolls + an even/odd select with
  a precomputed per-lane frequency vector (ops/rope.py laws).  Partial
  rotation (rot_dim < head_dim, e.g. head_dim=64) rotates IN PLACE with
  zero frequency on unrotated channels (cos=1/sin=0 pass-through): per-head
  dot products are invariant under the reference's channel permutation, so
  only the externally-built cross-K cache is lane-remapped to match.
* SwiGLU's lane split is avoided by pre-splitting dense1's kernel into the
  value/gate halves (each zero-padded to 128 lanes) on the host.
* The Keras masked-softmax laws are reproduced exactly: the additive -1e9
  mask (absorbing in f32), the lifted PAD-query quirk, and the
  uniform-softmax law for zero-length encodings (cross query zeroed with
  validity lifted to the true encoder width — decode/greedy.py).

All other math is float32; K/V caches may be stored bfloat16
(``cache_dtype``).  Token streams can differ from the XLA path only through
float associativity at argmax near-ties (and bf16 rounding when the fast
modes are on).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MASK_BIAS = -1e9
SEG = 32  # time columns per attention segment (straight-line, cond-gated)
LANE_TILE = 128
_VMEM_BUDGET = 118 * 1024 * 1024  # v5e VMEM is ~128 MB

__all__ = ["fused_greedy_decode", "fused_supported", "fused_fits",
           "tree_fully_quantized"]

# matmul weights the kernel keeps VMEM-resident (per decoder block)
_MAT_PATHS = [
    ["masked_mhsa", "mha", "query_kernel"],
    ["masked_mhsa", "mha", "key_kernel"],
    ["masked_mhsa", "mha", "value_kernel"],
    ["masked_mhsa", "mha", "projection_kernel"],
    ["cross_attention", "mha", "query_kernel"],
    ["cross_attention", "mha", "projection_kernel"],
    ["ffn", "dense1", "kernel"],
    ["ffn", "dense2", "kernel"],
]


# ---------------------------------------------------------------------------
# host-side constant builders
# ---------------------------------------------------------------------------


def _ones_block(d: int, head_dim: int) -> np.ndarray:
    """Block-diagonal ones: matmul by it = per-head sum re-broadcast."""
    m = np.zeros((d, d), np.float32)
    for h in range(d // head_dim):
        m[h * head_dim:(h + 1) * head_dim, h * head_dim:(h + 1) * head_dim] = 1.0
    return m


def _head_sum_matrix(d: int, head_dim: int) -> np.ndarray:
    """[d, 128]: matmul by it = per-head sums DEFLATED to one lane per head."""
    m = np.zeros((d, LANE_TILE), np.float32)
    for h in range(d // head_dim):
        m[h * head_dim:(h + 1) * head_dim, h] = 1.0
    return m


def _head_expand_matrix(d: int, head_dim: int) -> np.ndarray:
    """[128, d]: matmul by it = per-head lanes re-broadcast from lane h."""
    return _head_sum_matrix(d, head_dim).T.copy()


def _freq_lanes(d: int, head_dim: int, inv_freq: np.ndarray,
                rot_dim: int) -> np.ndarray:
    """Per-lane RoPE angular frequency: lane f → inv_freq[(f % head_dim)//2]
    for the first ``rot_dim`` channels of each head, 0 for unrotated channels
    (cos=1, sin=0 → exact pass-through, including the pair-roll term)."""
    f = np.arange(d)
    j = f % head_dim
    out = np.where(j < rot_dim, inv_freq[np.minimum(j, rot_dim - 1) // 2], 0.0)
    return out[None, :].astype(np.float32)  # [1, d]


def _rope_inplace_perm(d: int, head_dim: int, rot_dim: int) -> np.ndarray:
    """Lane permutation mapping the reference RoPE output layout
    (``[unrotated_tail, rotated_head]`` per head, ops/rope.py:77-86) to the
    kernel's IN-PLACE layout (first ``rot_dim`` channels rotated, tail kept
    in position).  Per-head dot products are invariant under a shared channel
    permutation, so the kernel rotates in place and only the externally-built
    cross-K cache needs this remap.  Identity when rot_dim == head_dim."""
    f = np.arange(d)
    h, j = f // head_dim, f % head_dim
    src_j = np.where(j < rot_dim, (head_dim - rot_dim) + j, j - rot_dim)
    return (h * head_dim + src_j).astype(np.int32)


def _even_mask(d: int) -> np.ndarray:
    return (np.arange(d) % 2 == 0).astype(np.float32)[None, :]  # [1, d]


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _kernel(
    # weights (resident: constant index maps)
    emb,          # [Vp, D]
    cls_w,        # [D, Vp]
    cls_b,        # [1, Vp]  (pad lanes hold -1e30)
    freq,         # [1, D]
    evenm,        # [1, D]
    onesb,        # [D, D] block-diagonal ones
    freq_c,       # [1, Dp]   cross-path variants: the cross K/V HBM arrays
    evenm_c,      # [1, Dp]   are lane-padded to a 128 multiple (Mosaic DMA
    onesb_c,      # [Dp, Dp]  slices need tile-aligned minor dims), so the
                  #           cross flash math runs Dp wide — physically free
                  #           (a D=192 vreg already occupies 256 lanes)
    wq, wk, wv, wo,      # [NB, D, D]
    ln1g, ln1b,          # [NB, 1, D]
    wcq, wco,            # [NB, D, Dp], [NB, Dp, D]  (zero-padded)
    ln2g, ln2b,          # [NB, 1, D]
    w1a, w1b_, b1a, b1b, # [NB, D, HP], [NB, D, HP], [NB, 1, HP], [NB, 1, HP]
    w2, b2,              # [NB, HP, D], [NB, 1, D]
    ln3g, ln3b,          # [NB, 1, D]
    # per-cell
    crossk, crossv,      # [n_cells, NB, Tc, R, Dp] in ANY/HBM (DMA'd per cell)
    cross_valid,         # [Tc, R, 1] float (1 = attend)
    qzero,               # [1, R, 1] float (1 = zero the cross query)
    row_pad,             # [1, R, 1] float (1 = batch-padding row: born finished)
    # with quantized=True, 11 per-channel scale inputs follow, then
    # (cache_q8) cross_scale [1, R, 2NB] f32; then output tok_ref
    # [Lp, R, 1] int32, scratch kself/vself/cross (all cache dtype) + 2 DMA
    # semaphores, and (cache_q8) kvscale [Lp, R, 2*NB] f32
    *rest,
    n_blocks: int,
    head_dim: int,
    max_length: int,
    bos_id: int,
    eos_id: int,
    pad_id: int,
    precise_scores: bool,
    fast_segments: bool = False,
    quantized: bool = False,
    cache_q8: bool = False,
    cross_q8: bool = False,
    deflate: bool = False,
    combine_kv: bool = False,
    probe: str = "none",
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rest = list(rest)
    if cache_q8:
        # int8 SELF caches: each written K/V column stores PER-ROW symmetric
        # scales in ``kvscale`` [Lp, R, 2NB] (k at lane b, v at lane NB+b —
        # static minor indices, dynamic step on the MAJOR dim, per Mosaic's
        # dynamic-store law).  Halves self-cache VMEM vs bfloat16; ~0.8%
        # score error, same class as the bf16 fast mode.
        kvscale = rest.pop()
    else:
        kvscale = None
    # int8 CROSS caches (independent of cache_q8 — the "mixed" sweet spot is
    # bf16 self + int8 cross): PER-(block, row) scales over the whole time
    # axis (``cross_scale`` [1, R, 2NB]).  The k scale folds into the query
    # BEFORE the segment loop and the v scale into the attention output
    # AFTER it, so — unlike the self path's per-column scales — int8 cross
    # adds ZERO per-segment work.  The HBM arrays are CELL-MAJOR
    # [n_cells, NB, Tc, R, Dp] precisely so the per-cell DMA indexes the
    # outermost dim: slicing a packed int8 sublane dim fails Mosaic
    # legalization, a major-dim index does not.
    sem_v = rest.pop()
    sem_k = rest.pop()
    crossv_v = rest.pop()
    crossk_v = rest.pop()
    vself = rest.pop()
    kself = rest.pop()
    tok_ref = rest.pop()
    if combine_kv:
        # combined K|V self cache ([.., 2D] lanes — kills the D→128-multiple
        # lane-padding waste): KV-path RoPE lanes (zero frequency on V lanes
        # = exact pass-through) and the division-expand matrix that
        # broadcasts the deflated denominator over BOTH halves (the
        # e-expand matrix maps heads to V lanes only; dividing the zero K
        # lanes by zero would NaN-poison the wo matmul)
        expboth = rest.pop()
        evenkv = rest.pop()
        freqkv = rest.pop()
    else:
        expboth = evenkv = freqkv = None
    if deflate:
        # deflated-score head-sum/expand matrices (self + cross variants);
        # under combine_kv the self pair is [2D, 128] / [128, 2D] (scores
        # sum K lanes only; probabilities expand to V lanes only)
        expb_c = rest.pop()
        sumb_c = rest.pop()
        expb = rest.pop()
        sumb = rest.pop()
    else:
        sumb = expb = sumb_c = expb_c = None
    # cross_q8 can hold WITHOUT cache_q8 (the "mixed" mode: bf16 self caches
    # — no per-column rescale tax — with int8 cross, whose per-row scales
    # fold into q / the output for free)
    cross_scale = rest.pop() if cross_q8 else None
    if quantized:
        # int8-resident serving: the matmul weights (emb, cls_w, wq..wo,
        # wcq/wco, w1a/w1b_/w2) arrive as int8 with these per-output-channel
        # scales ([NB, 1, C] / [1, C] f32); ``mmq`` dequantizes at the use
        # site (weights stay int8 in VMEM — ~4× less weight VMEM and HBM
        # load traffic).  Dequantization multiplies the WEIGHT (scale is
        # per-last-axis channel) before the dot, reproducing the XLA
        # dequantize-then-matmul values.
        (emb_s, cls_s, wq_s, wk_s, wv_s, wo_s, wcq_s, wco_s,
         w1a_s, w1b_s, w2_s) = rest
    else:
        assert not rest, rest
        emb_s = cls_s = wq_s = wk_s = wv_s = wo_s = None
        wcq_s = wco_s = w1a_s = w1b_s = w2_s = None

    def mmq(x, ref, sref, b=None):
        w = ref[:] if b is None else ref[b]
        if quantized:
            s = sref[:] if b is None else sref[b]
            w = w.astype(jnp.float32) * s
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    r = tok_ref.shape[1]
    d = emb.shape[1]
    dp = crossk_v.shape[-1]
    vp = emb.shape[0]
    tc = crossk_v.shape[1]
    lp = tok_ref.shape[0]
    scale = 1.0 / (head_dim ** 0.5)
    n_self_segs = lp // SEG
    n_cross_segs = tc // SEG
    H128 = LANE_TILE  # deflated scores live on one lane per head (H ≤ 128)
    # fast_segments: the [SEG, R, D] per-segment vector chain (mask select,
    # exp, probs·V, reduction trees) runs bfloat16 — the online-softmax carry
    # (m/den/acc) and everything outside flash_segment stay float32.  Halves
    # the flash temp VMEM; same error class as the bf16 cache mode.
    vdt = jnp.bfloat16 if fast_segments else jnp.float32

    def head_sums(g, ones_ref):
        """[M, W] q·k products → per-head sums replicated per head (MXU).
        The ones matrix is block-diagonal, so the matmul runs per diagonal
        128-lane tile (off-diagonal tiles are zero).  Accumulation is f32 in
        the MXU either way; ``vdt`` output rounds once at write-out."""
        w = g.shape[1]
        outs = []
        for lo in range(0, w, LANE_TILE):
            hi = min(lo + LANE_TILE, w)
            gi = g[:, lo:hi]
            if not precise_scores:
                gi = gi.astype(jnp.bfloat16)
            oi = ones_ref[lo:hi, lo:hi].astype(gi.dtype)
            # accumulate f32 ALWAYS (Mosaic rejects bf16 matmul accumulators
            # when both operands are bf16 — fast_scores+fast_segments); one
            # rounding at write-out keeps the vdt contract
            outs.append(
                jnp.dot(gi, oi, preferred_element_type=jnp.float32).astype(vdt)
            )
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)

    def rope(x, cos, sin, evm):
        # interleaved pairs: (x0, x1) → (x0 c - x1 s, x1 c + x0 s)
        left = pltpu.roll(x, x.shape[1] - 1, axis=1)   # lane f ← f+1
        right = pltpu.roll(x, 1, axis=1)               # lane f ← f-1
        half = jnp.where(evm[:] > 0, -left, right)
        return x * cos + half * sin

    def layer_norm(x, g, b):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) * (x - mu), axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-3) * g + b

    def tree_max(x):
        w = x.shape[0]
        while w > 1:
            w //= 2
            x = jnp.maximum(x[:w], x[w:2 * w])
        return x  # [1, R, D]

    def q8_store(cache, b, scale_lane, s, x):
        """Quantize one K/V column [R, D] to int8 with PER-ROW symmetric
        scales (a [R, 1] lanes-broadcast divide — the layer_norm pattern;
        Mosaic cannot broadcast [1,1] into both sublanes and lanes)."""
        sc = jnp.maximum(
            jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0, 1e-12
        )  # [R, 1]
        q = jnp.floor(x / sc + 0.5).astype(jnp.int8)
        cache[b, pl.ds(s, 1)] = q[None]
        kvscale[pl.ds(s, 1), :, scale_lane:scale_lane + 1] = sc[None]

    def scale_col(lo, lane):
        """[SEG, R, 1] per-(column, row) scales from the kvscale scratch."""
        return kvscale[lo:lo + SEG, :, lane:lane + 1]

    def q8_store_kv(b, s, kv):
        """Combined-layout int8 store: one [R, 2D] column, separate per-row
        symmetric scales for the K and V halves (selected with lane masks —
        a 2D-lane slice at offset D would not be tile-aligned)."""
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, kv.shape[-1]), 1)
        kmask = (lanes < d).astype(jnp.float32)
        vmask = 1.0 - kmask
        ksc = jnp.maximum(
            jnp.max(jnp.abs(kv) * kmask, axis=-1, keepdims=True) / 127.0, 1e-12
        )
        vsc = jnp.maximum(
            jnp.max(jnp.abs(kv) * vmask, axis=-1, keepdims=True) / 127.0, 1e-12
        )
        sc_lanes = kmask * ksc + vmask * vsc                  # [R, 2D]
        q = jnp.floor(kv / sc_lanes + 0.5).astype(jnp.int8)
        kself[b, pl.ds(s, 1)] = q[None]
        kvscale[pl.ds(s, 1), :, b:b + 1] = ksc[None]
        kvscale[pl.ds(s, 1), :, n_blocks + b:n_blocks + b + 1] = vsc[None]

    def flash_segment(q, kseg, vseg, valid, carry, ones_ref=onesb,
                      kscale=None, vscale=None):
        """One SEG-column online-softmax update.  q [R, W] pre-scaled f32;
        kseg/vseg [SEG, R, W] in ``vdt``; valid [SEG, R, 1] bool;
        kscale/vscale [SEG, R, 1] per-column int8-cache scales (None = float
        caches).  The carry (m/den/acc, [1, R, W]) is always f32."""
        m, den, acc = carry
        w = q.shape[-1]
        if probe == "noseg":
            return m, den, acc
        g = kseg * q[None].astype(vdt)
        if probe == "nomm":
            si = g
        else:
            si = head_sums(g.reshape(SEG * r, w), ones_ref).reshape(SEG, r, w)
        if kscale is not None:
            si = si * kscale.astype(vdt)
        if probe != "nomask":
            si = jnp.where(valid, si, vdt(MASK_BIAS))
            m2 = jnp.maximum(m, tree_max(si).astype(jnp.float32))
        else:
            m2 = m
        if probe == "noexp":
            sc = m - m2
            e = si - m2.astype(vdt)
        else:
            sc = jnp.exp(m - m2)
            e = jnp.exp(si - m2.astype(vdt))
        ev = (e * vscale.astype(vdt) if vscale is not None else e) * vseg
        if probe == "notree":
            te, tv = e[:1], ev[:1]
        else:
            w = SEG
            te, tv = e, ev
            while w > 1:
                w //= 2
                te = te[:w] + te[w:2 * w]
                tv = tv[:w] + tv[w:2 * w]
        return (m2, den * sc + te.astype(jnp.float32),
                acc * sc + tv.astype(jnp.float32))

    def flash_init(w=d):
        return (
            jnp.full((1, r, w), MASK_BIAS, jnp.float32),
            jnp.zeros((1, r, w), jnp.float32),
            jnp.zeros((1, r, w), jnp.float32),
        )

    def flash_segment_deflated(q, kseg, vseg, valid, carry, sum_ref, exp_ref,
                               kscale=None, vscale=None):
        """flash_segment with DEFLATED scores: per-head sums land on one lane
        per head ([SEG, R, 128] instead of the inflated [SEG, R, W]), so the
        mask select, exp, running-max and the te tree run at 128 lanes —
        about half the VPU work for W=192/256 — and one extra MXU matmul
        against ``exp_ref`` re-broadcasts the probabilities across each
        head's lanes just before the ·V product.  Numerically EXACT vs the
        inflated path (same sums in the same order).  Carry: m/den
        [1, R, 128], acc [1, R, W]."""
        m, den, acc = carry
        w = q.shape[-1]
        g = (kseg * q[None].astype(vdt)).reshape(SEG * r, w)
        if not precise_scores:
            g = g.astype(jnp.bfloat16)
        si = jnp.dot(g, sum_ref[:].astype(g.dtype),
                     preferred_element_type=jnp.float32).astype(vdt).reshape(
                         SEG, r, H128)
        if kscale is not None:
            si = si * kscale.astype(vdt)
        si = jnp.where(valid, si, vdt(MASK_BIAS))
        m2 = jnp.maximum(m, tree_max(si).astype(jnp.float32))
        sc = jnp.exp(m - m2)
        e = jnp.exp(si - m2.astype(vdt))
        # the softmax DENOMINATOR accumulates unscaled exponentials — only
        # the V-product side takes the int8-cache vscale
        wseg = SEG
        te = e
        while wseg > 1:
            wseg //= 2
            te = te[:wseg] + te[wseg:2 * wseg]
        ev128 = e * vscale.astype(vdt) if vscale is not None else e
        e_infl = jnp.dot(
            ev128.reshape(SEG * r, H128), exp_ref[:].astype(e.dtype),
            preferred_element_type=jnp.float32,
        ).astype(vdt).reshape(SEG, r, w)
        tv = e_infl * vseg
        wseg = SEG
        while wseg > 1:
            wseg //= 2
            tv = tv[:wseg] + tv[wseg:2 * wseg]
        # each head carries its OWN running max, so acc's rescale factor
        # must be inflated per lane too (tiny [R, 128] @ [128, W] matmul)
        sc_infl = jnp.dot(sc.reshape(r, H128), exp_ref[:],
                          preferred_element_type=jnp.float32)[None]
        return (m2, den * sc + te.astype(jnp.float32),
                acc * sc_infl + tv.astype(jnp.float32))

    def flash_init_deflated(w=d):
        return (
            jnp.full((1, r, H128), MASK_BIAS, jnp.float32),
            jnp.zeros((1, r, H128), jnp.float32),
            jnp.zeros((1, r, w), jnp.float32),
        )

    col3 = jax.lax.broadcasted_iota(jnp.int32, (SEG, r, 1), 0)

    # ---- per-cell init -----------------------------------------------------
    # Cross K/V live in HBM and are DMA'd into single-buffered scratch once
    # per cell (a blocked VMEM input would be double-buffered across cells —
    # measured: that halves the achievable rows_per_cell, and cells decode
    # sequentially at ~16 µs/step fixed cost each).
    cell = pl.program_id(0)
    ck_copy = pltpu.make_async_copy(crossk.at[cell], crossk_v, sem_k)
    cv_copy = pltpu.make_async_copy(crossv.at[cell], crossv_v, sem_v)
    ck_copy.start()
    cv_copy.start()
    tok_ref[:] = jnp.full(tok_ref.shape, pad_id, jnp.int32)
    tok_ref[0:1] = jnp.full((1, r, 1), bos_id, jnp.int32)
    # Zero the cache scratch: masked flash contributions multiply exp(-1e9-m)
    # (exactly 0.0) by unwritten cache lanes — 0 × garbage-NaN would poison
    # the accumulator (and argmax over NaNs silently returns 0).
    kself[:] = jnp.zeros(kself.shape, kself.dtype)
    vself[:] = jnp.zeros(vself.shape, vself.dtype)
    if cache_q8:
        # ones, not garbage: masked flash terms multiply 0 × scale — a NaN
        # scale on an unwritten column would poison the accumulator
        kvscale[:] = jnp.ones(kvscale.shape, jnp.float32)
    ck_copy.wait()
    cv_copy.wait()

    # ---- decode loop -------------------------------------------------------
    def body(carry):
        s, finished = carry
        cur = tok_ref[pl.ds(s, 1)][0]                      # [R, 1] int32
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (r, vp), 1) == cur)
        x = mmq(onehot.astype(jnp.float32), emb, emb_s)     # [R, D]

        ang = s.astype(jnp.float32) * freq[:]
        cos = jnp.cos(ang)
        sin = jnp.sin(ang)
        ang_c = s.astype(jnp.float32) * freq_c[:]
        cos_c = jnp.cos(ang_c)
        sin_c = jnp.sin(ang_c)
        if combine_kv:
            ang_kv = s.astype(jnp.float32) * freqkv[:]
            cos_kv = jnp.cos(ang_kv)
            sin_kv = jnp.sin(ang_kv)
        cur_pad = (cur == pad_id)                           # [R, 1]

        for b in range(n_blocks):
            # -- masked self-attention over the cache ------------------------
            if combine_kv:
                # q arrives 2D-wide for free (wq zero-padded on output
                # channels host-side); RoPE's zero V-half frequencies pass
                # the zero lanes through exactly
                q = rope(mmq(x, wq, wq_s, b), cos_kv, sin_kv, evenkv) * scale
                # ONE [D, 2D] matmul produces K|V; RoPE rotates the K half in
                # place and passes the V half through (zero frequencies)
                kv = rope(mmq(x, wk, wk_s, b),  # wk slot holds wkv
                          cos_kv, sin_kv, evenkv)
                if cache_q8:
                    q8_store_kv(b, s, kv)
                else:
                    kself[b, pl.ds(s, 1)] = kv[None].astype(kself.dtype)
            else:
                q = rope(mmq(x, wq, wq_s, b), cos, sin, evenm) * scale
                k = rope(mmq(x, wk, wk_s, b), cos, sin, evenm)
                v = mmq(x, wv, wv_s, b)
                if cache_q8:
                    q8_store(kself, b, b, s, k)
                    q8_store(vself, b, n_blocks + b, s, v)
                else:
                    kself[b, pl.ds(s, 1)] = k[None].astype(kself.dtype)
                    vself[b, pl.ds(s, 1)] = v[None].astype(vself.dtype)

            if combine_kv:
                carry_a = flash_init_deflated(2 * d)
            elif deflate:
                carry_a = flash_init_deflated()
            else:
                carry_a = flash_init()
            for si_ in range(n_self_segs):
                def seg_fn(m_, d_, a_, si_=si_, b=b, q=q):
                    kseg = kself[b, si_ * SEG:(si_ + 1) * SEG].astype(vdt)
                    vseg = (kseg if combine_kv else
                            vself[b, si_ * SEG:(si_ + 1) * SEG].astype(vdt))
                    tokc = tok_ref[si_ * SEG:(si_ + 1) * SEG]
                    live = (col3 + si_ * SEG) <= s
                    # PAD-query quirk: a PAD current token attends everything
                    valid = live & ((tokc != pad_id) | cur_pad[None])
                    ksc = vsc = None
                    if cache_q8:
                        ksc = scale_col(si_ * SEG, b)
                        vsc = scale_col(si_ * SEG, n_blocks + b)
                    if deflate:
                        return flash_segment_deflated(
                            q, kseg, vseg, valid, (m_, d_, a_), sumb, expb,
                            kscale=ksc, vscale=vsc)
                    return flash_segment(q, kseg, vseg, valid, (m_, d_, a_),
                                         kscale=ksc, vscale=vsc)

                carry_a = jax.lax.cond(
                    si_ * SEG <= s, seg_fn,
                    lambda m_, d_, a_: (m_, d_, a_), *carry_a,
                )
            _, den, acc = carry_a
            if deflate:
                div_ref = expboth if combine_kv else expb
                den_w = jnp.dot(den[0], div_ref[:],
                                preferred_element_type=jnp.float32)
                attn = acc[0] / den_w
            else:
                attn = acc[0] / den[0]
            # combined layout: wo is zero-row-padded to [2D, D], so the K
            # lanes of attn (exactly 0) drop out inside the projection
            x = layer_norm(x + mmq(attn, wo, wo_s, b), ln1g[b], ln1b[b])

            # -- cross-attention over the encoder (fully static, Dp wide:
            # pad lanes are zero in q and K/V, so their per-fake-head scores
            # are exactly 0 and their attn output exactly 0 — wco's padded
            # input rows are zero, so nothing leaks) -------------------------
            qc = rope(mmq(x, wcq, wcq_s, b), cos_c, sin_c, evenm_c) * scale
            qc = jnp.where(qzero[0] > 0, 0.0, qc)
            if cross_q8:
                # per-(block, row) int8 cross-K scale, folded into the query
                # (constant across time columns, so it commutes with q·k)
                qc = qc * cross_scale[0, :, b:b + 1]
            carry_c = flash_init_deflated(dp) if deflate else flash_init(dp)
            for si_ in range(n_cross_segs):
                kseg = crossk_v[b, si_ * SEG:(si_ + 1) * SEG].astype(vdt)
                vseg = crossv_v[b, si_ * SEG:(si_ + 1) * SEG].astype(vdt)
                valid = cross_valid[si_ * SEG:(si_ + 1) * SEG] > 0
                if deflate:
                    carry_c = flash_segment_deflated(
                        qc, kseg, vseg, valid, carry_c, sumb_c, expb_c)
                else:
                    carry_c = flash_segment(qc, kseg, vseg, valid, carry_c,
                                            ones_ref=onesb_c)
            _, den, acc = carry_c
            if deflate:
                den_w = jnp.dot(den[0], expb_c[:], preferred_element_type=jnp.float32)
                cross = acc[0] / den_w
            else:
                cross = acc[0] / den[0]
            if cross_q8:
                # per-(block, row) int8 cross-V scale: Σ p_t (s·v_t) = s·Σ —
                # folds into the output, zero per-segment work
                cross = cross * cross_scale[0, :, n_blocks + b:n_blocks + b + 1]
            x = layer_norm(x + mmq(cross, wco, wco_s, b), ln2g[b], ln2b[b])

            # -- SwiGLU FFN (dense1 pre-split into value/gate halves) --------
            ha = mmq(x, w1a, w1a_s, b) + b1a[b]
            hb = mmq(x, w1b_, w1b_s, b) + b1b[b]
            ffn = mmq(ha * (hb * jax.nn.sigmoid(hb)), w2, w2_s, b) + b2[b]
            x = layer_norm(x + ffn, ln3g[b], ln3b[b])

        logits = mmq(x, cls_w, cls_s) + cls_b[:]            # [R, Vp]
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
        nxt = jnp.where(finished > 0, pad_id, nxt)
        tok_ref[pl.ds(s + 1, 1)] = nxt[None]
        # int32 flags: bool vector while-carries fail Mosaic legalization
        finished = jnp.maximum(finished, (nxt == eos_id).astype(jnp.int32))
        return s + 1, finished

    def cond(carry):
        s, finished = carry
        if probe != "none":
            # probes ablate math, so argmax is garbage — pin the step count
            # to the full cap so probe timings are comparable
            return s < max_length
        return (s < max_length) & (jnp.min(finished) < 1)

    # Batch-padding rows are born finished: they have zero-length encodings
    # (uniform cross attention over noise) so they rarely emit EOS, and the
    # early-exit law is min(finished) — an unseeded pad row would force its
    # whole cell to decode to the max_length cap even when every real row
    # finished (ADVICE r1).
    init_finished = row_pad[0].astype(jnp.int32)
    jax.lax.while_loop(cond, body, (jnp.int32(0), init_finished))


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def fused_supported(cfg) -> bool:
    """The kernel's structural preconditions (flagship config satisfies all)."""
    from telugu_asr_tpu.ops.rope import rope_rot_dim

    return (
        cfg.num_heads * cfg.head_dim == cfg.d_model
        and rope_rot_dim(cfg.head_dim) % 2 == 0
        and cfg.head_dim % 2 == 0
        and LANE_TILE % cfg.head_dim == 0
        and cfg.activation == "swiglu"
        and (cfg.d_model * cfg.fc_factor) % 2 == 0
    )


def _pick_rows(batch: int, n_blocks: int, d: int, lp: int, tc: int,
               cache_bytes: int, weight_bytes: int,
               cross_bytes: Optional[int] = None,
               combined: bool = False,
               row_multiple: int = 8,
               extra_per_row_bytes: int = 0) -> int:
    """Largest multiple-of-8 divisor of batch whose cell fits the VMEM budget
    (Mosaic requires blocked sublane dims divisible by 8); 0 if even the
    8-row cell does not fit (callers fall back to the XLA path).

    Budget laws measured from Mosaic allocation dumps: the minor (lane) dim
    is padded to a 128 multiple; cross K/V live in HBM (cell-major) and are
    DMA'd into single-buffered scratch.  ``cache_bytes == 1`` is the full
    int8 mode: int8 SELF caches (sublanes tile at 32, so small cells pay
    padding) AND int8 cross scratch (per-row scales fold into q / the
    output, so the cross side carries no per-segment scale temps)."""
    dp = _round_up(d, LANE_TILE)
    if cross_bytes is None:
        cross_bytes = cache_bytes
    # the cross HBM DMA indexes only the major (cell) dim, so rows need only
    # satisfy the blocked-sublane law of the VMEM-sliced inputs (f32 tile 8);
    # the beam kernel additionally requires whole K-row utterance groups per
    # cell (row_multiple = lcm(8, beam_size)) and charges its per-row
    # selection/token-history temps via ``extra_per_row_bytes``
    row_tile = row_multiple

    def tile_rows(rows: int, nbytes: int) -> int:
        # Mosaic allocates the [.., rows, dp] scratch in packed sublane
        # tiles: 8 rows for f32, 16 for bf16, 32 for int8 — charge the
        # PADDED row count (a rows=8 bf16 cell physically occupies 16 rows)
        return _round_up(rows, {1: 32, 2: 16}.get(nbytes, 8))

    best = 0
    for rows in range(row_tile, batch + 1, row_tile):
        if batch % rows:
            continue
        # flash temps (rough): int8 SELF caches run extra per-segment vector
        # ops (scale slices, si/ev rescales) whose f32 temps measured
        # ~+10 MB at rows=32/lp=448 — a 12× multiplier there compiled to
        # 128.36 MB used (369 KB over capacity), so the self-q8 law charges
        # 22×.  Int8 CROSS caches add nothing per segment (fold-into-q).
        temps = (22 if cache_bytes == 1 else 12) * SEG * rows * dp * 4
        # combined K|V layout: ONE [.., 2d] array (2d is a 128 multiple for
        # every HPO d_model, so no lane padding) instead of two d→dp-padded
        # arrays — 2·dp vs round_up(2d) lanes per column (25% less at d=192)
        self_lanes = _round_up(2 * d, LANE_TILE) if combined else 2 * dp
        cell = (
            n_blocks * lp * tile_rows(rows, cache_bytes) * self_lanes * cache_bytes
            + 2 * n_blocks * tc * tile_rows(rows, cross_bytes) * dp * cross_bytes
            + temps
            + rows * extra_per_row_bytes
        )
        if cache_bytes == 1:
            # per-row self-scale scratch [Lp, R, 2NB] (lanes pad to 128)
            cell += lp * rows * LANE_TILE * 4
        if weight_bytes + cell <= _VMEM_BUDGET:
            best = rows
    return best


def _weight_bytes_estimate(n_blocks: int, d: int, vocab: int,
                           itemsize: int = 4) -> int:
    """Rough resident-weight footprint for the budget laws: 12 d×d-class
    matrices per block (QKV/O, cross Q/O, and the ≈4d²-worth of FFN mats at
    fc_factor 4 with SwiGLU halving) plus embedding + classifier + the ones
    matrix."""
    vp = _round_up(vocab, LANE_TILE)
    dp = _round_up(d, LANE_TILE)
    return (12 * d * d * n_blocks + 2 * vp * d + dp * dp) * itemsize


def tree_fully_quantized(decoder_params: dict, embedding_table,
                         classifier_kernel) -> bool:
    """True iff EVERY matmul weight the kernel touches is an int8 leaf —
    the kernel's own int8-residency condition.  A partially quantized tree
    is dequantized in the wrapper and runs the FLOAT kernel, so fit checks
    must budget f32 weights for it (greedy auto-resolve uses this; checking
    for *any* quantized leaf would underestimate the footprint 4×)."""
    from telugu_asr_tpu.ops.quant import is_quantized_leaf

    def get(blk, path):
        return functools.reduce(lambda t, k: t[k], path, blk)

    return (
        is_quantized_leaf(embedding_table)
        and is_quantized_leaf(classifier_kernel)
        and all(
            is_quantized_leaf(get(blk, p))
            for blk in decoder_params["blocks"]
            for p in _MAT_PATHS
        )
    )


def fused_fits(cfg, batch: int, t_enc: int, max_length: int,
               vocab: int = 256, quantized: bool = False,
               cache_dtype: Optional[str] = None,
               cross_cache_dtype: Optional[str] = None) -> bool:
    """Would ANY cell grouping fit VMEM for these decode shapes?  Greedy
    auto-resolve uses this to fall back to the XLA path instead of failing
    inside Mosaic — the HPO space's larger d_models with long caps can
    exceed the ~128 MB budget.  With ``cache_dtype=None`` the auto ladder's
    modes (f32/bf16) are checked; pinning a dtype checks that mode's law
    (int8 fits strictly more shapes than either)."""
    if t_enc < 1 or max_length < 1:
        # Audio shorter than the conv front-end's receptive field (~0.85 s
        # at the flagship stride ladder) produces an EMPTY encoder output;
        # zero-sized cross scratch is a Mosaic "layout too complicated"
        # compile error, so route such degenerate batches to the XLA path
        # (which tolerates 0-sized dims).
        return False
    lp = _round_up(max_length + 1, SEG)
    tc = _round_up(t_enc, SEG)
    b = _round_up(max(batch, 8), 8)
    wb = _weight_bytes_estimate(
        cfg.num_blocks, cfg.d_model, vocab, 1 if quantized else 4
    )
    if cache_dtype is not None:
        cbs = (jnp.dtype(cache_dtype).itemsize,)
    else:
        cbs = (2, 4)
    crb = jnp.dtype(cross_cache_dtype).itemsize if cross_cache_dtype else None
    return any(
        _pick_rows(b, cfg.num_blocks, cfg.d_model, lp, tc, cb, wb,
                   cross_bytes=crb) > 0
        for cb in cbs
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_length", "bos_id", "eos_id", "pad_id",
        "parity_unmasked_cross", "cache_dtype", "cross_cache_dtype",
        "rows_per_cell", "precise_scores", "fast_segments", "deflate_scores",
        "combine_kv", "probe", "interpret",
    ),
)
def fused_greedy_decode(
    params: dict,
    cfg,
    encoder_out: jnp.ndarray,
    encoder_mask: Optional[jnp.ndarray],
    embedding_table: jnp.ndarray,
    classifier_kernel: jnp.ndarray,
    classifier_bias: jnp.ndarray,
    max_length: int,
    *,
    bos_id: int,
    eos_id: int,
    pad_id: int,
    parity_unmasked_cross: bool = False,
    cache_dtype: Optional[str] = None,
    cross_cache_dtype: Optional[str] = None,
    rows_per_cell: Optional[int] = None,
    precise_scores: bool = True,
    fast_segments: bool = False,
    deflate_scores: bool = False,
    combine_kv: bool = False,
    probe: str = "none",
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the whole greedy decode in one Pallas kernel.

    ``params`` is the DECODER param tree (``params["decoder"]`` of the model).
    Returns ``(tokens [B, max_length], lengths [B])`` with the exact layout
    and EOS/length laws of :func:`telugu_asr_tpu.decode.greedy.greedy_decode`.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from telugu_asr_tpu.ops.attention import make_cross_attention_cache
    from telugu_asr_tpu.ops.rope import rope_inv_freq

    assert fused_supported(cfg), "config outside the fused kernel's support"
    nb, d, h, dh = cfg.num_blocks, cfg.d_model, cfg.num_heads, cfg.head_dim
    true_batch, t_enc, _ = encoder_out.shape
    if cache_dtype is None and rows_per_cell is None:
        # Auto cache-dtype ladder: cells decode SEQUENTIALLY, so wall time is
        # ~(batch / rows_per_cell) × per-cell cost — maximizing rows_per_cell
        # dominates.  Pick the HIGHEST precision that reaches the best
        # achievable rows (f32 → bf16).  int8 self caches (cache_dtype=
        # "int8") are explicit opt-in: they double rows again, but the
        # per-element quantize/rescale tax measured SLOWER end-to-end than
        # bf16 at fewer rows on v5e (9.2 vs 7.4 ms, flagship B=64), so auto
        # never picks them.  Pass cache_dtype explicitly to pin a mode.
        from telugu_asr_tpu.ops.quant import is_quantized_leaf as _is_q

        lp_ = _round_up(max_length + 1, SEG)
        tc_ = _round_up(t_enc, SEG)
        b_ = true_batch if interpret else _round_up(true_batch, 8)
        # int8-resident weights (~¼ the bytes) leave more VMEM for caches
        wb_ = (12 if _is_q(embedding_table) else 48) * d * d * nb
        ladder = [(None, 4), ("bfloat16", 2)]
        rows_by = [
            (_pick_rows(b_, nb, d, lp_, tc_, bytes_, wb_), name)
            for name, bytes_ in ladder
        ]
        best_rows = max(r for r, _ in rows_by)
        for r, name in rows_by:
            if r == best_rows:
                cache_dtype = name
                break
    cdtype = jnp.dtype(cache_dtype) if cache_dtype else jnp.dtype("float32")
    cache_q8 = cdtype == jnp.int8
    # The cross caches may take their OWN dtype ("mixed" modes) — the sweet
    # spot is bf16 self (no per-column rescale tax) + int8 cross (per-row
    # scales fold into q / the output for free, half the scratch).
    crdtype = jnp.dtype(cross_cache_dtype) if cross_cache_dtype else cdtype
    cross_q8 = crdtype == jnp.int8

    # pad the batch to a multiple of 8 (Mosaic sublane-divisibility of blocks);
    # padded rows have zero-length encodings (the uniform-softmax law), are
    # born finished in the kernel, and are stripped from the output.  In
    # interpret mode (CPU tests) padding only happens when rows_per_cell is
    # pinned, so the pad-row laws stay testable without Mosaic.
    if interpret:
        batch = _round_up(true_batch, rows_per_cell) if rows_per_cell else true_batch
    else:
        batch = _round_up(true_batch, 8)
    if batch != true_batch:
        pad_rows = [(0, batch - true_batch)]
        encoder_out = jnp.pad(encoder_out, pad_rows + [(0, 0), (0, 0)])
        if encoder_mask is not None:
            encoder_mask = jnp.pad(encoder_mask, pad_rows + [(0, 0)])

    lp = _round_up(max_length + 1, SEG)
    tc = _round_up(t_enc, SEG)
    # Cross K/V live in HBM and are DMA-sliced per cell; Mosaic requires the
    # sliced memref's minor dim to be a 128 multiple, so the cross arrays
    # (and the cross-path q/attn math) are lane-padded to dpad.  This is
    # physically free: a D=192 vector register already spans 256 lanes.
    dpad = _round_up(d, LANE_TILE)
    emb_arr = (
        embedding_table["q8"] if isinstance(embedding_table, dict) else embedding_table
    )
    vocab = emb_arr.shape[0]
    vp = _round_up(vocab, LANE_TILE)

    # ---- stacked weights ---------------------------------------------------
    # Matmul weights may arrive int8-quantized (ops/quant.py leaves,
    # ``{"q8", "scale"}``).  When EVERY matmul weight is quantized, the
    # kernel runs int8-resident (weights stay int8 in VMEM, dequantized at
    # each use site — ~4× less weight VMEM + HBM load traffic); a partially
    # quantized tree is dequantized here and runs the float path, so values
    # always match XLA's dequantize-then-matmul exactly.
    from telugu_asr_tpu.ops.quant import dequantize_array, is_quantized_leaf

    blocks = params["blocks"]

    def get(blk, path):
        return functools.reduce(lambda t, k: t[k], path, blk)

    quantized = tree_fully_quantized(params, embedding_table, classifier_kernel)

    def deq(leaf):
        if is_quantized_leaf(leaf):
            return dequantize_array(leaf["q8"], leaf["scale"])
        return leaf

    def stack(path):
        return jnp.stack([deq(get(blk, path)) for blk in blocks])

    def stack_q(path):
        """int8 stack [NB, ..., C] + scale stack [NB, 1, C]."""
        leaves = [get(blk, path) for blk in blocks]
        q = jnp.stack([l["q8"] for l in leaves])
        s = jnp.stack([l["scale"] for l in leaves])[:, None, :]
        return q, s

    if quantized:
        wq, wq_s = stack_q(_MAT_PATHS[0])
        wk, wk_s = stack_q(_MAT_PATHS[1])
        wv, wv_s = stack_q(_MAT_PATHS[2])
        wo, wo_s = stack_q(_MAT_PATHS[3])
        wcq, wcq_s = stack_q(_MAT_PATHS[4])
        wco, wco_s = stack_q(_MAT_PATHS[5])
        w1, w1_s = stack_q(_MAT_PATHS[6])   # [NB, D, HID], [NB, 1, HID]
        w2r, w2_s = stack_q(_MAT_PATHS[7])  # [NB, HID//2, D], [NB, 1, D]
    else:
        wq = stack(_MAT_PATHS[0])
        wk = stack(_MAT_PATHS[1])
        wv = stack(_MAT_PATHS[2])
        wo = stack(_MAT_PATHS[3])
        wcq = stack(_MAT_PATHS[4])
        wco = stack(_MAT_PATHS[5])
        w1 = stack(_MAT_PATHS[6])     # [NB, D, HID]
        w2r = stack(_MAT_PATHS[7])    # [NB, HID//2, D]
    if combine_kv:
        assert deflate_scores, "combine_kv requires deflate_scores"
        # one [D, 2D] K|V projection (the wk slot carries it; the wv slot
        # becomes a never-read dummy); wq gains zero output channels so q
        # arrives 2D-wide for free; wo is zero-row-padded to [2D, D] so the
        # K lanes of the combined attention output drop out in the
        # projection matmul
        wq = jnp.pad(wq, [(0, 0), (0, 0), (0, d)])
        wk = jnp.concatenate([wk, wv], axis=-1)
        wo = jnp.pad(wo, [(0, 0), (d, 0), (0, 0)])
        wv = jnp.zeros((nb, 1, 8), wk.dtype)
        if quantized:
            wq_s = jnp.pad(wq_s, [(0, 0), (0, 0), (0, d)], constant_values=1.0)
            wk_s = jnp.concatenate([wk_s, wv_s], axis=-1)
            wv_s = jnp.zeros((nb, 1, 8), jnp.float32)
    ln1g = stack(["masked_mhsa", "ln", "gamma"])[:, None, :]
    ln1b = stack(["masked_mhsa", "ln", "beta"])[:, None, :]
    ln2g = stack(["cross_attention", "ln", "gamma"])[:, None, :]
    ln2b = stack(["cross_attention", "ln", "beta"])[:, None, :]
    # cross-path weights pad to the dpad-wide math: wcq gains zero OUTPUT
    # channels (qc pad lanes = 0), wco gains zero INPUT rows (pad-lane attn
    # contributes nothing)
    if dpad != d:
        wcq = jnp.pad(wcq, [(0, 0), (0, 0), (0, dpad - d)])
        wco = jnp.pad(wco, [(0, 0), (0, dpad - d), (0, 0)])
        if quantized:
            wcq_s = jnp.pad(wcq_s, [(0, 0), (0, 0), (0, dpad - d)],
                            constant_values=1.0)

    b1 = stack(["ffn", "dense1", "bias"])       # [NB, HID]
    b2 = stack(["ffn", "dense2", "bias"])[:, None, :]
    ln3g = stack(["ffn", "ln", "gamma"])[:, None, :]
    ln3b = stack(["ffn", "ln", "beta"])[:, None, :]
    hid = w1.shape[-1]
    inner = hid // 2
    hp = _round_up(inner, LANE_TILE)
    pad_h = [(0, 0), (0, 0), (0, hp - inner)]
    w1a = jnp.pad(w1[:, :, :inner], pad_h)
    w1b_ = jnp.pad(w1[:, :, inner:], pad_h)
    b1a = jnp.pad(b1[:, None, :inner], [(0, 0), (0, 0), (0, hp - inner)])
    b1b = jnp.pad(b1[:, None, inner:], [(0, 0), (0, 0), (0, hp - inner)])
    w2 = jnp.pad(w2r, [(0, 0), (0, hp - inner), (0, 0)])
    if quantized:
        # padded channels dequantize to 0 (q8 pad 0, scale pad 1)
        w1a_s = jnp.pad(w1_s[:, :, :inner], pad_h, constant_values=1.0)
        w1b_s = jnp.pad(w1_s[:, :, inner:], pad_h, constant_values=1.0)

    if quantized:
        emb = jnp.pad(embedding_table["q8"], [(0, vp - vocab), (0, 0)])
        emb_s = embedding_table["scale"][None, :]                      # [1, D]
        cls_w = jnp.pad(classifier_kernel["q8"], [(0, 0), (0, vp - vocab)])
        cls_s = jnp.pad(classifier_kernel["scale"], [(0, vp - vocab)],
                        constant_values=1.0)[None, :]                  # [1, Vp]
    else:
        emb = jnp.pad(deq(embedding_table), [(0, vp - vocab), (0, 0)])
        cls_w = jnp.pad(deq(classifier_kernel), [(0, 0), (0, vp - vocab)])
    cls_b = jnp.pad(classifier_bias[None, :], [(0, 0), (0, vp - vocab)],
                    constant_values=-1e30)

    from telugu_asr_tpu.ops.rope import rope_rot_dim

    rot_dim = rope_rot_dim(dh)
    inv_freq = np.asarray(rope_inv_freq(dh))
    freq_np = _freq_lanes(d, dh, inv_freq, rot_dim)
    freq = jnp.asarray(freq_np)
    evenm = jnp.asarray(_even_mask(d))
    onesb = jnp.asarray(_ones_block(d, dh))
    # dpad-wide cross variants: pad lanes get zero frequency (cos=1, sin=0 —
    # exact pass-through of the zero pad values)
    freq_c = jnp.asarray(np.pad(freq_np, [(0, 0), (0, dpad - d)]))
    evenm_c = jnp.asarray(_even_mask(dpad))
    onesb_c = jnp.asarray(_ones_block(dpad, dh))
    k_perm = None if rot_dim == dh else _rope_inplace_perm(d, dh, rot_dim)
    if deflate_scores:
        assert probe == "none", "probes are inflated-path only"
        if combine_kv:
            # scores sum the K half only; probabilities expand to the V half
            sum_self = np.vstack(
                [_head_sum_matrix(d, dh), np.zeros((d, LANE_TILE), np.float32)]
            )
            exp_self = np.hstack(
                [np.zeros((LANE_TILE, d), np.float32), _head_expand_matrix(d, dh)]
            )
        else:
            sum_self = _head_sum_matrix(d, dh)
            exp_self = _head_expand_matrix(d, dh)
        deflate_mats = [
            jnp.asarray(sum_self),
            jnp.asarray(exp_self),
            jnp.asarray(_head_sum_matrix(dpad, dh)),
            jnp.asarray(_head_expand_matrix(dpad, dh)),
        ]
    else:
        deflate_mats = []
    if combine_kv:
        combine_mats = [
            # KV-path RoPE lanes: zero frequency on the V half = exact
            # pass-through; evenm arbitrary there (sin = 0)
            jnp.asarray(np.pad(freq_np, [(0, 0), (0, d)])),
            jnp.asarray(np.pad(_even_mask(d), [(0, 0), (0, d)])),
            # division-expand: the deflated denominator broadcasts over BOTH
            # halves (zero K-lane denominators would NaN-poison 0/0)
            jnp.asarray(np.hstack([_head_expand_matrix(d, dh)] * 2)),
        ]
    else:
        combine_mats = []

    # ---- cross caches (time-major [NB, Tc, B, D]) --------------------------
    # Built once per batch in XLA; quantized key/value kernels are
    # dequantized here (outside the kernel) — same values as the float path.
    cks, cvs = [], []
    for blk in blocks:
        mha = {k: deq(v) for k, v in blk["cross_attention"]["mha"].items()}
        cc = make_cross_attention_cache(
            mha, encoder_out, h
        )  # k/v: [B, H, Dh, T]
        for arrs, kk in ((cks, "k"), (cvs, "v")):
            a = cc[kk].reshape(batch, d, t_enc)
            if kk == "k" and k_perm is not None:
                # partial RoPE (rot_dim < head_dim): the externally-built K
                # cache is in the reference's permuted channel layout; remap
                # to the kernel's in-place layout so q·k pairs line up.
                a = a[:, k_perm, :]
            a = a.transpose(2, 0, 1)  # [T, B, D]
            arrs.append(jnp.pad(a, [(0, tc - t_enc), (0, 0), (0, dpad - d)]))
    crossk_f = jnp.stack(cks)  # [NB, Tc, B, Dp] f32; dtype/layout applied
    crossv_f = jnp.stack(cvs)  # below once rows_per_cell is known

    # ---- cross validity + the zero-length uniform-softmax law --------------
    cols = jnp.arange(tc)[None, :]
    if parity_unmasked_cross or encoder_mask is None:
        cross_valid = jnp.broadcast_to((cols < t_enc), (batch, tc))
        qzero = jnp.zeros((batch,), jnp.float32)
    else:
        em = encoder_mask.astype(bool)
        n_valid = jnp.sum(em.astype(jnp.int32), axis=-1)
        empty = n_valid == 0
        base = jnp.pad(em, [(0, 0), (0, tc - t_enc)])
        cross_valid = jnp.where(empty[:, None], cols < t_enc, base)
        qzero = empty.astype(jnp.float32)
    cross_valid_t = cross_valid.astype(jnp.float32).T[:, :, None]  # [Tc, B, 1]
    qzero_t = qzero[None, :, None]                                 # [1, B, 1]
    row_pad_t = (jnp.arange(batch) >= true_batch).astype(jnp.float32)[None, :, None]

    # ---- grid / specs ------------------------------------------------------
    weight_arrays = [emb, cls_w, onesb, onesb_c, wq, wk, wv, wo, wcq, wco,
                     w1a, w1b_, w2]
    if quantized:
        scale_arrays = [emb_s, cls_s, wq_s, wk_s, wv_s, wo_s, wcq_s, wco_s,
                        w1a_s, w1b_s, w2_s]
        weight_arrays += scale_arrays
    weight_bytes = sum(
        int(np.prod(a.shape)) * jnp.dtype(a.dtype).itemsize for a in weight_arrays
    )
    rows = rows_per_cell or _pick_rows(
        batch, nb, d, lp, tc, cdtype.itemsize, weight_bytes,
        cross_bytes=crdtype.itemsize, combined=combine_kv,
    )
    if rows == 0:
        raise ValueError(
            f"fused decode does not fit VMEM: d_model={d} n_blocks={nb} "
            f"cap={max_length} t_enc={t_enc} cache={cdtype}/{crdtype} — use "
            "attention_impl='xla' (greedy auto-resolve checks fused_fits)"
        )
    assert batch % rows == 0
    n_cells = batch // rows

    # ---- cross cache dtype + CELL-MAJOR layout -----------------------------
    # [NB, Tc, B, Dp] → [n_cells, NB, Tc, rows, Dp]: the kernel's per-cell
    # DMA indexes the OUTERMOST dim (a packed-int8 sublane slice fails Mosaic
    # legalization; a major-dim index is always legal, and the copy is one
    # contiguous block for every dtype).
    if cross_q8:
        # int8 cross caches, ONE symmetric scale per (block, row) across the
        # whole time axis — the kernel folds the k scale into the query and
        # the v scale into the attention output (zero per-segment work)
        def q8_cross(a):
            sc = jnp.maximum(
                jnp.max(jnp.abs(a), axis=(1, 3)) / 127.0, 1e-12
            )  # [NB, B]
            q = jnp.round(a / sc[:, None, :, None]).astype(jnp.int8)
            return q, sc

        crossk_f, ksc = q8_cross(crossk_f)
        crossv_f, vsc = q8_cross(crossv_f)
        cross_scale = jnp.concatenate([ksc.T, vsc.T], axis=-1)[None]  # [1, B, 2NB]
    else:
        crossk_f = crossk_f.astype(crdtype)
        crossv_f = crossv_f.astype(crdtype)
        cross_scale = None

    def cell_major(a):
        return jnp.moveaxis(a.reshape(nb, tc, n_cells, rows, dpad), 2, 0)

    crossk = cell_major(crossk_f)
    crossv = cell_major(crossv_f)

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda c, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    in_specs = [
        const(emb.shape), const(cls_w.shape), const(cls_b.shape),
        const(freq.shape), const(evenm.shape), const(onesb.shape),
        const(freq_c.shape), const(evenm_c.shape), const(onesb_c.shape),
        const(wq.shape), const(wk.shape), const(wv.shape), const(wo.shape),
        const(ln1g.shape), const(ln1b.shape),
        const(wcq.shape), const(wco.shape),
        const(ln2g.shape), const(ln2b.shape),
        const(w1a.shape), const(w1b_.shape), const(b1a.shape), const(b1b.shape),
        const(w2.shape), const(b2.shape),
        const(ln3g.shape), const(ln3b.shape),
        # cross K/V stay in HBM; the kernel DMAs each cell's row slice into
        # single-buffered scratch (blocked VMEM inputs are double-buffered)
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((tc, rows, 1), lambda c: (0, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rows, 1), lambda c: (0, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rows, 1), lambda c: (0, c, 0),
                     memory_space=pltpu.VMEM),
    ]
    if quantized:
        in_specs += [const(a.shape) for a in scale_arrays]
    if cross_q8:
        in_specs.append(
            pl.BlockSpec((1, rows, 2 * nb), lambda c: (0, c, 0),
                         memory_space=pltpu.VMEM)
        )
    in_specs += [const(a.shape) for a in deflate_mats]
    in_specs += [const(a.shape) for a in combine_mats]

    # ``probe`` is the development-only ablation hook (tools/
    # probe_fused_costs.py) — an explicit STATIC argument so each probe mode
    # is its own jit entry (an env-var read at trace time would silently
    # reuse a kernel compiled under a different mode).  Results are
    # numerically wrong under any probe != "none"; never set in production.
    kernel = functools.partial(
        _kernel,
        n_blocks=nb,
        head_dim=dh,
        max_length=max_length,
        bos_id=bos_id,
        eos_id=eos_id,
        pad_id=pad_id,
        precise_scores=precise_scores,
        fast_segments=fast_segments,
        quantized=quantized,
        cache_q8=cache_q8,
        cross_q8=cross_q8,
        deflate=deflate_scores,
        combine_kv=combine_kv,
        probe=probe,
    )

    tokens3 = pl.pallas_call(
        kernel,
        grid=(n_cells,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((lp, rows, 1), lambda c: (0, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lp, batch, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((nb, lp, rows, 2 * d if combine_kv else d), cdtype),
            # combined layout: K|V live in ONE scratch (the second is a
            # never-read dummy kept for argument arity)
            pltpu.VMEM((1, 1, 8, LANE_TILE) if combine_kv else (nb, lp, rows, d),
                       cdtype),
            pltpu.VMEM((nb, tc, rows, dpad), crdtype),
            pltpu.VMEM((nb, tc, rows, dpad), crdtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ] + ([pltpu.VMEM((lp, rows, 2 * nb), jnp.float32)] if cache_q8 else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        emb, cls_w, cls_b, freq, evenm, onesb, freq_c, evenm_c, onesb_c,
        wq, wk, wv, wo, ln1g, ln1b,
        wcq, wco, ln2g, ln2b,
        w1a, w1b_, b1a, b1b, w2, b2, ln3g, ln3b,
        crossk, crossv, cross_valid_t, qzero_t, row_pad_t,
        *(scale_arrays if quantized else ()),
        *((cross_scale,) if cross_q8 else ()),
        *deflate_mats,
        *combine_mats,
    )

    tokens = tokens3[:, :true_batch, 0].T             # [B, Lp]
    generated = tokens[:, 1 : max_length + 1]
    is_eos = generated == eos_id
    lengths = jnp.where(
        jnp.any(is_eos, axis=-1),
        jnp.argmax(is_eos, axis=-1) + 1,
        max_length,
    ).astype(jnp.int32)
    return generated, lengths
