"""Whole-decode-loop fused Pallas kernel for BEAM search.

Extends the greedy whole-loop kernel (decode_fused.py) to beam search: ONE
kernel launch runs the entire beam decode — token while_loop, all decoder
blocks over VMEM-resident KV caches, classifier, per-group log-softmax,
top-K candidate selection over K·V, and the surviving-parent cache reorder —
for a cell of whole utterance groups (``rows = K × Gc``, beam-major).

Semantics are exactly :func:`telugu_asr_tpu.decode.beam.beam_search_decode`
(the XLA reference): BOS-seeded beams with only slot 0 live, log-softmax
candidate scores, finished beams emit PAD at zero cost, ``top_k`` ties break
toward the lowest (parent, token) index, EOS finishes a beam, the loop exits
early when every row is finished.  Token streams can differ from the XLA
path only at float-associativity argmax/top-k near-ties.

Design notes (beyond the greedy kernel's — see decode_fused.py):

* **Beam-major rows.**  A cell's rows are laid out ``q * Gc + g`` (beam
  index major, ``Gc`` utterance groups per cell), NOT utterance-major: a
  group-local cyclic shift in the beam index is then ONE global sublane
  roll by ``o·Gc`` (utterance-major needs two rolls + an iota select to
  stitch each group boundary), and the beam-invariant cross K/V needs only
  ``Gc`` scratch rows — the kernel tiles them across the K beams with a
  register concat at use, cutting cross VMEM and the per-cell DMA by K×.
  The host permutes encoder rows in and tokens/scores out.
* **Eager in-VMEM parent reorder via group rolls.**  Beam search must
  re-gather each row's K/V history to its surviving parent every step.  A
  per-row gather is not vectorizable in Mosaic, but the parent always lies
  in the same utterance group, so the gather is K-1 beam-major rolls with a
  per-row ``where(parent_offset == o)``.  K passes over the live cache
  columns ≈ the attention's own read traffic — measured cheaper than the
  all-pairs ancestor-weighted form (decode/beam.py ``lazy_reorder``), which
  needs per-(row, column) ancestor masks that Mosaic's lane-padded
  ``[.., R, 1]`` layouts make ruinously expensive to recompose.
* **No PAD-query quirk in the valid mask.**  A live (unfinished) beam never
  holds PAD or EOS in its history (a finished parent's children are finished
  by construction), and finished rows' decoder outputs are discarded (their
  candidates are replaced by the PAD-only law) — so self-attention validity
  is just ``column <= step``, with no dependence on reordered token values.
* **Top-K without ``lax.top_k``.**  Per group, K extractions of
  (max value, lowest flat index among ties) using lane roll/max trees over
  the Vp lanes (tile-pairwise first, so any 128-multiple Vp works) and
  log2(K) group-roll trees over the beam rows; the winning candidate is
  masked and the next extracted.  All rows of a group compute every winner;
  row q adopts winner q (`slot == extraction index`).
* Token histories live in a lane-major ``[R, Lp]`` scratch (one vector
  register row per beam): the per-step parent reorder and the one-hot
  column write are single cheap passes, where the greedy kernel's
  time-major ``[Lp, R, 1]`` layout would pay a 128× lane-padding tax to
  rewrite history.  The finished output is copied once at the end.

Supported modes: float32 / bfloat16 self+cross caches, ``precise_scores``
fixed on, beam_size a power of two ≥ 2 (group rolls and top-K trees double);
int8-quantized weight trees are dequantized on the host (the int8-resident /
deflate / combine-kv opt-ins stay greedy-only until profiled here).
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from telugu_asr_tpu.ops.pallas.decode_fused import (
    LANE_TILE,
    MASK_BIAS,
    SEG,
    _VMEM_BUDGET,
    _even_mask,
    _freq_lanes,
    _ones_block,
    _rope_inplace_perm,
    _round_up,
    fused_supported,
)

__all__ = ["fused_beam_search_decode", "fused_beam_supported", "fused_beam_fits"]

# A/B override: force the pre-ledger eager full-sweep reorder (no identity-
# step skip, no convergence horizon).  Read at trace time — use a fresh
# process per setting (bench/test runs are subprocesses anyway).  Exact
# either way; exists so the ledger's win can be measured on real workloads.
_FORCE_EAGER = os.environ.get("TELUGU_BEAM_EAGER", "") == "1"

NEG_INF = -1e9  # decode/beam.py score floor (NOT the mask bias)
BIG_IDX = np.int32(2 ** 30)


def _next_pow2(k: int) -> int:
    p = 1
    while p < k:
        p *= 2
    return p


def fused_beam_supported(cfg, beam_size: int) -> bool:
    """Structural preconditions: greedy kernel support + 2 ≤ K ≤ 16.

    Non-power-of-two widths run on the next power-of-two row layout with
    dead tail slots (killed every step — exact width-K semantics); the VMEM
    fit laws charge the padded width."""
    return fused_supported(cfg) and 2 <= beam_size <= 16


def _lcm8(k: int) -> int:
    return 8 * k // np.gcd(8, k)


def _pick_rows_beam(flat: int, kb: int, n_blocks: int, d: int, lp: int,
                    tc: int, vp: int, cache_bytes: int,
                    weight_bytes: int, dedup: bool) -> int:
    """Largest beam-major cell (rows = K·Gc) fitting the VMEM budget.

    Same budget laws as decode_fused._pick_rows, with the beam deltas: the
    cell charges the [R, Lp] token-history scratch plus ~6 [R, Vp]-class
    f32 selection temps, and with ``dedup`` the cross K/V scratch holds
    only ``Gc = rows / K`` utterance rows (beams share them — the kernel
    tiles at use; requires Gc % 8 == 0, the blocked-sublane law of the
    per-cell cross inputs).  Without dedup the cross rows are
    beam-duplicated (any Gc; larger scratch + DMA)."""
    dp = _round_up(d, LANE_TILE)
    mult = 8 * kb if dedup else _lcm8(kb)

    def tile_rows(rows: int, nbytes: int) -> int:
        return _round_up(rows, {1: 32, 2: 16}.get(nbytes, 8))

    best = 0
    for rows in range(mult, flat + 1, mult):
        if flat % rows:
            continue
        cross_rows = rows // kb if dedup else rows
        temps = 12 * SEG * rows * dp * 4
        cell = (
            2 * n_blocks * lp * tile_rows(rows, cache_bytes) * dp * cache_bytes
            + 2 * n_blocks * tc * tile_rows(cross_rows, cache_bytes) * dp * cache_bytes
            + temps
            + rows * (2 * lp + 6 * vp) * 4  # token + ancestor ledgers + topk temps
        )
        if weight_bytes + cell <= _VMEM_BUDGET:
            best = rows
    return best


def fused_beam_fits(cfg, batch: int, beam_size: int, t_enc: int,
                    max_length: int, vocab: int = 256,
                    cache_dtype: Optional[str] = None,
                    quantized: bool = False) -> bool:
    """Would any whole-group cell fit VMEM? (auto-resolve fallback check)

    ``quantized``: int8-resident weights — ~4× less weight VMEM, so int8
    trees fit strictly more (K, cap) points than float ones."""
    if not fused_beam_supported(cfg, beam_size):
        return False
    kb = _next_pow2(beam_size)
    lp = _round_up(max_length + 1, SEG)
    tc = _round_up(t_enc, SEG)
    mult = _lcm8(kb)
    b = _round_up(max(batch, 1), mult // kb) * kb
    vp = _round_up(vocab, LANE_TILE)
    wb = 48 * cfg.d_model * cfg.d_model * cfg.num_blocks
    if quantized:
        wb = wb // 4 + 12 * cfg.d_model * cfg.num_blocks * 4  # q8 + f32 scales
    cbs = (jnp.dtype(cache_dtype).itemsize,) if cache_dtype else (2, 4)
    return any(
        _pick_rows_beam(b, kb, cfg.num_blocks, cfg.d_model, lp, tc,
                        vp, cb, wb, dedup) > 0
        for cb in cbs for dedup in (True, False)
    )


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _kernel(
    emb,          # [Vp, D]
    cls_w,        # [D, Vp]
    cls_b,        # [1, Vp]  (pad lanes -1e30)
    ones_vp,      # [Vp, Vp] all-ones (lane-sum via MXU for log-softmax)
    freq, evenm, onesb,          # self-path RoPE/head-sum constants
    freq_c, evenm_c, onesb_c,    # cross-path (dpad-wide) variants
    wq, wk, wv, wo,              # [NB, D, D]
    ln1g, ln1b,
    wcq, wco,                    # [NB, D, Dp], [NB, Dp, D]
    ln2g, ln2b,
    w1a, w1b_, b1a, b1b, w2, b2,
    ln3g, ln3b,
    *rest,                       # (quantized) 11 per-channel weight scales;
                                 # then crossk, crossv [n_cells, NB, Tc, Gc, Dp]
                                 # HBM (per UTTERANCE), cross_valid [Tc, Gc, 1],
                                 # qzero [1, Gc, 1], row_pad [1, Gc, 1] (pad
                                 # GROUPS: born finished), outputs tok_out
                                 # [R, Lp] int32 (beam-major rows q*Gc+g) +
                                 # score_out [R, 1] f32, scratch tok_hist
                                 # [R, Lp], kself/vself [NB, Lp, R, D],
                                 # crossk_v/crossv_v [NB, Tc, Gc, Dp], 2 sems
    n_blocks: int,
    head_dim: int,
    k_beams: int,
    k_true: int,
    max_length: int,
    vocab: int,
    bos_id: int,
    eos_id: int,
    pad_id: int,
    dedup: bool,
    quantized: bool = False,
    probe: str = "none",
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rest = list(rest)
    (crossk, crossv, cross_valid, qzero, row_pad,
     tok_out, score_out, tok_hist, anc_hist, kself, vself,
     crossk_v, crossv_v, sem_k, sem_v) = rest[-15:]
    if quantized:
        # int8-resident serving (same law as decode_fused._kernel): matmul
        # weights arrive int8 with per-output-channel scales; ``mmq``
        # dequantizes at the use site — weights stay int8 in VMEM (~4× less
        # weight VMEM, which is exactly what the K=8 VMEM-bound cells need).
        (emb_s, cls_s, wq_s, wk_s, wv_s, wo_s, wcq_s, wco_s,
         w1a_s, w1b_s, w2_s) = rest[:11]
    else:
        emb_s = cls_s = wq_s = wk_s = wv_s = wo_s = None
        wcq_s = wco_s = w1a_s = w1b_s = w2_s = None

    def mmq(x, ref, sref, b=None):
        w = ref[:] if b is None else ref[b]
        if quantized:
            s = sref[:] if b is None else sref[b]
            w = w.astype(jnp.float32) * s
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    r = tok_hist.shape[0]
    lp = tok_hist.shape[1]
    d = emb.shape[1]
    dp = crossk_v.shape[-1]
    vp = emb.shape[0]
    tc = crossk_v.shape[1]
    scale = 1.0 / (head_dim ** 0.5)
    n_self_segs = lp // SEG
    n_cross_segs = tc // SEG
    kb = k_beams
    gc = r // kb  # utterance groups per cell (rows are BEAM-MAJOR: q*Gc + g)

    # ---- iotas (built once; Mosaic hoists loop-invariant constants) --------
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0) // gc      # [R, 1]
    lane_v = jax.lax.broadcasted_iota(jnp.int32, (r, vp), 1)           # [R, Vp]
    fidx = q_iota * vp + lane_v                                        # [R, Vp]
    lane_l = jax.lax.broadcasted_iota(jnp.int32, (r, lp), 1)           # [R, Lp]
    col3 = jax.lax.broadcasted_iota(jnp.int32, (SEG, r, 1), 0)

    def tile_beams(x, axis):
        """dedup mode: [.., Gc, ..] per-utterance values → [.., K·Gc, ..]
        beam-major.  Dup mode (Gc < 8 would break the blocked-sublane law):
        arrays arrive pre-tiled rows-wide from the host — identity."""
        if not dedup:
            return x
        return jnp.concatenate([x] * kb, axis=axis)

    # ---- group-local cyclic shifts ------------------------------------------
    def group_roll(x, o, axis):
        """x with the BEAM index shifted o within each utterance group
        (cyclic): out[.., q*Gc + g, ..] = x[.., ((q+o) % K)*Gc + g, ..].
        Beam-major rows make this ONE global sublane roll."""
        if o == 0:
            return x
        n = x.shape[axis]
        return pltpu.roll(x, n - o * gc, axis=axis)  # out[i] = x[(i + o*Gc) % n]

    def group_sel(x, off, axis):
        """out[row] = x[parent_row] where parent = group row (q + off) % K;
        ``off`` broadcasts per row ([R, 1] or [1, R, 1])."""
        out = x
        for o in range(1, kb):
            out = jnp.where(off == o, group_roll(x, o, axis), out)
        return out

    # ---- lane / group all-reductions ----------------------------------------
    def lane_allreduce(x, op):
        """All lanes ← reduce over ALL lanes (any 128-multiple width):
        pairwise-combine 128-lane tiles, tree inside the tile, re-tile."""
        w = x.shape[-1]
        tiles = [x[:, lo:lo + LANE_TILE] for lo in range(0, w, LANE_TILE)]
        t = tiles[0]
        for other in tiles[1:]:
            t = op(t, other)
        sh = 1
        while sh < LANE_TILE:
            t = op(t, pltpu.roll(t, sh, axis=1))
            sh *= 2
        return jnp.concatenate([t] * (w // LANE_TILE), axis=-1) if w > LANE_TILE else t

    def group_allreduce(x, op):
        sh = 1
        while sh < kb:
            x = op(x, group_roll(x, sh, axis=0))
            sh *= 2
        return x

    def rope(x, cos, sin, evm):
        left = pltpu.roll(x, x.shape[1] - 1, axis=1)
        right = pltpu.roll(x, 1, axis=1)
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
        return x

    def head_sums(g, ones_ref):
        w = g.shape[1]
        outs = []
        for lo in range(0, w, LANE_TILE):
            hi = lo + LANE_TILE
            oi = ones_ref[lo:hi, lo:hi]
            outs.append(jnp.dot(g[:, lo:hi], oi,
                                preferred_element_type=jnp.float32))
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)

    def flash_segment(q, kseg, vseg, valid, carry, ones_ref=onesb):
        m, den, acc = carry
        w = q.shape[-1]
        if probe == "noseg":
            return m, den, acc
        g = kseg * q[None]
        if probe == "nomm":
            si = g
        else:
            si = head_sums(g.reshape(SEG * r, w), ones_ref).reshape(SEG, r, w)
        if probe != "nomask":
            si = jnp.where(valid, si, MASK_BIAS)
            m2 = jnp.maximum(m, tree_max(si))
        else:
            m2 = m
        if probe == "noexp":
            sc = m - m2
            e = si - m2
        else:
            sc = jnp.exp(m - m2)
            e = jnp.exp(si - m2)
        ev = e * vseg
        if probe == "notree":
            te, tv = e[:1], ev[:1]
        else:
            wseg = SEG
            te, tv = e, ev
            while wseg > 1:
                wseg //= 2
                te = te[:wseg] + te[wseg:2 * wseg]
                tv = tv[:wseg] + tv[wseg:2 * wseg]
        return m2, den * sc + te, acc * sc + tv

    def flash_init(w=d):
        return (
            jnp.full((1, r, w), MASK_BIAS, jnp.float32),
            jnp.zeros((1, r, w), jnp.float32),
            jnp.zeros((1, r, w), jnp.float32),
        )

    # ---- per-cell init -------------------------------------------------------
    cell = pl.program_id(0)
    ck_copy = pltpu.make_async_copy(crossk.at[cell], crossk_v, sem_k)
    cv_copy = pltpu.make_async_copy(crossv.at[cell], crossv_v, sem_v)
    ck_copy.start()
    cv_copy.start()
    tok_hist[:] = jnp.where(lane_l == 0, bos_id, pad_id).astype(jnp.int32)
    # Ancestor ledger: anc_hist[r, c] = which group slot ORIGINALLY wrote the
    # K/V values row r currently holds at column c.  Values only ever move by
    # exact selects, so ``all slots agree at column c`` ⇔ the group's K rows
    # hold BIT-IDENTICAL cache values there ⇔ reordering that column is a
    # no-op.  Column 0 (BOS) is identical across beams at write (same token,
    # same weights): born converged (slot 0 for everyone).
    anc_hist[:] = jnp.where(lane_l == 0, 0, q_iota)
    kself[:] = jnp.zeros(kself.shape, kself.dtype)
    vself[:] = jnp.zeros(vself.shape, vself.dtype)
    ck_copy.wait()
    cv_copy.wait()

    # ---- decode loop ---------------------------------------------------------
    def body(carry):
        s, finished, cur, scores = carry
        # This step writes K/V at column s: stamp its ownership (step 0 is
        # the BOS write — identical across beams, so it stays slot 0).
        anc_hist[:] = jnp.where((lane_l == s) & (s > 0), q_iota, anc_hist[:])
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (r, vp), 1) == cur)
        x = mmq(onehot.astype(jnp.float32), emb, emb_s)

        ang = s.astype(jnp.float32) * freq[:]
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        ang_c = s.astype(jnp.float32) * freq_c[:]
        cos_c, sin_c = jnp.cos(ang_c), jnp.sin(ang_c)

        for b in range(n_blocks):
            q = rope(mmq(x, wq, wq_s, b), cos, sin, evenm) * scale
            k = rope(mmq(x, wk, wk_s, b), cos, sin, evenm)
            v = mmq(x, wv, wv_s, b)
            kself[b, pl.ds(s, 1)] = k[None].astype(kself.dtype)
            vself[b, pl.ds(s, 1)] = v[None].astype(vself.dtype)

            carry_a = flash_init()
            for si_ in range(n_self_segs):
                def seg_fn(m_, d_, a_, si_=si_, b=b, q=q):
                    kseg = kself[b, si_ * SEG:(si_ + 1) * SEG].astype(jnp.float32)
                    vseg = vself[b, si_ * SEG:(si_ + 1) * SEG].astype(jnp.float32)
                    # a live beam never holds PAD/EOS in-history and finished
                    # rows' outputs are discarded → validity is just liveness
                    valid = (col3 + si_ * SEG) <= s
                    return flash_segment(q, kseg, vseg, valid, (m_, d_, a_))

                carry_a = jax.lax.cond(
                    si_ * SEG <= s, seg_fn,
                    lambda m_, d_, a_: (m_, d_, a_), *carry_a,
                )
            _, den, acc = carry_a
            attn = acc[0] / den[0]
            x = layer_norm(x + mmq(attn, wo, wo_s, b), ln1g[b], ln1b[b])

            qc = rope(mmq(x, wcq, wcq_s, b), cos_c, sin_c, evenm_c) * scale
            qc = jnp.where(tile_beams(qzero[0], 0) > 0, 0.0, qc)
            carry_c = flash_init(dp)
            for si_ in range(n_cross_segs):
                # cross K/V are beam-invariant: the scratch holds Gc
                # utterance rows; tile across the K beams in-register
                kseg = tile_beams(
                    crossk_v[b, si_ * SEG:(si_ + 1) * SEG], 1
                ).astype(jnp.float32)
                vseg = tile_beams(
                    crossv_v[b, si_ * SEG:(si_ + 1) * SEG], 1
                ).astype(jnp.float32)
                valid = tile_beams(
                    cross_valid[si_ * SEG:(si_ + 1) * SEG], 1
                ) > 0
                carry_c = flash_segment(qc, kseg, vseg, valid, carry_c,
                                        ones_ref=onesb_c)
            _, den, acc = carry_c
            cross = acc[0] / den[0]
            x = layer_norm(x + mmq(cross, wco, wco_s, b), ln2g[b], ln2b[b])

            ha = mmq(x, w1a, w1a_s, b) + b1a[b]
            hb = mmq(x, w1b_, w1b_s, b) + b1b[b]
            ffn = mmq(ha * (hb * jax.nn.sigmoid(hb)), w2, w2_s, b) + b2[b]
            x = layer_norm(x + ffn, ln3g[b], ln3b[b])

        logits = mmq(x, cls_w, cls_s) + cls_b[:]

        # ---- log-softmax over the REAL vocab lanes (pad bias -1e30 makes
        # pad lanes irrelevant for max; they are excluded from the sum) ----
        if probe == "nologsm":
            logp = logits
        else:
            lmax = lane_allreduce(logits, jnp.maximum)
            e = jnp.where(lane_v < vocab, jnp.exp(logits - lmax), 0.0)
            lsum = jnp.dot(e, ones_vp[:], preferred_element_type=jnp.float32)
            logp = logits - lmax - jnp.log(lsum)

        # finished beams emit only PAD at zero cost (decode/beam.py law)
        fin_row = finished > 0
        pad_only = jnp.where(lane_v == pad_id, 0.0, NEG_INF)
        logp = jnp.where(fin_row, pad_only, logp)

        cand = scores + logp                                  # [R, Vp]

        # ---- top-K over each group's K·V candidates -----------------------
        new_scores = scores
        new_cur = cur
        par_slot = q_iota
        for j in range(0 if probe == "notopk" else kb):
            gm = group_allreduce(lane_allreduce(cand, jnp.maximum), jnp.maximum)
            idxs = jnp.where(cand == gm, fidx, BIG_IDX)
            gi = group_allreduce(lane_allreduce(idxs, jnp.minimum), jnp.minimum)
            win_par = gi[:, :1] // vp
            win_tok = gi[:, :1] - win_par * vp
            sel = q_iota == j
            new_scores = jnp.where(sel, gm[:, :1], new_scores)
            new_cur = jnp.where(sel, win_tok, new_cur)
            par_slot = jnp.where(sel, win_par, par_slot)
            cand = jnp.where(fidx == gi, NEG_INF * 4.0, cand)

        off = par_slot - q_iota
        off = jnp.where(off < 0, off + kb, off)               # [R, 1] in [0, K)

        # ---- adopt the parent's state --------------------------------------
        finished = group_sel(finished, off, axis=0)
        finished = jnp.maximum(finished, (new_cur == eos_id).astype(jnp.int32))
        if k_true < kb:
            # non-power-of-two beam widths run on the next power-of-two row
            # layout with DEAD tail slots: they receive extraction winners
            # K_true..kb-1 (the would-be over-width candidates) but are
            # killed immediately — score floor so they never parent a future
            # winner or win the final best-beam argmax, and born-finished so
            # they cannot hold the early-exit condition open.  This emulates
            # width-K_true exactly: each step keeps only the top K_true
            # candidates alive.
            dead = q_iota >= k_true
            new_scores = jnp.where(dead, NEG_INF, new_scores)
            finished = jnp.maximum(finished, dead.astype(jnp.int32))
        tok_hist[:] = jnp.where(
            lane_l == s + 1, new_cur, group_sel(tok_hist[:], off, axis=0)
        )

        # ---- eager cache reorder over the live columns ---------------------
        # Identity steps skip the whole sweep: once a group's beams settle
        # (every row adopts its own slot's winner — the steady state of
        # finished groups after one sorting step, and common in the EOS tail
        # of live ones) the gather is the identity and the K-1 roll+select
        # passes over every live segment buy nothing.  ``off == 0``
        # everywhere is exactly that case, so the skip is exact.  Probe
        # modes bypass the gate (their ablated scores make ``off`` garbage;
        # pinned-cap probe timings must stay workload-independent).
        off3 = off[None]

        def do_reorder():
            # Convergence horizon: rows only ever read their OWN row's cache,
            # and the ancestor ledger proves columns < h hold bit-identical
            # values across each group's live rows — gathering them is the
            # identity, so segments entirely below h skip.  In a real beam
            # decode the divergence window is the recent tokens only, which
            # collapses the reorder sweep from O(whole live history) to
            # O(tail) — the 64%-of-step-time term the K=8 probe exposed.
            a = anc_hist[:]
            if k_true < kb:
                # dead pow2-padding slots receive arbitrary winners and never
                # converge; they are born finished and never parent or feed a
                # live row, so exclude them from the agreement test
                dead = q_iota >= k_true
                a_hi = jnp.where(dead, -1, a)
                a_lo = jnp.where(dead, BIG_IDX, a)
            else:
                a_hi = a_lo = a
            gmax = group_allreduce(a_hi, jnp.maximum)
            gmin = group_allreduce(a_lo, jnp.minimum)
            conv = (gmax == gmin) | (lane_l > s)
            h = jnp.min(jnp.where(conv, BIG_IDX, lane_l))
            if probe != "none" or _FORCE_EAGER:
                # probes must measure the FULL eager sweep (comparable to
                # the ablation baselines), not the workload-dependent skip
                h = jnp.int32(-1)
            for b in range(n_blocks):
                for si_ in range(n_self_segs):
                    def reorder(b=b, si_=si_):
                        # Mosaic rotates are 32-bit only: bf16 caches reorder
                        # through f32 (one up/down-cast per live segment)
                        ks = kself[b, si_ * SEG:(si_ + 1) * SEG].astype(jnp.float32)
                        vs = vself[b, si_ * SEG:(si_ + 1) * SEG].astype(jnp.float32)
                        kself[b, si_ * SEG:(si_ + 1) * SEG] = group_sel(
                            ks, off3, axis=1).astype(kself.dtype)
                        vself[b, si_ * SEG:(si_ + 1) * SEG] = group_sel(
                            vs, off3, axis=1).astype(vself.dtype)

                    jax.lax.cond(
                        (si_ * SEG <= s) & ((si_ + 1) * SEG > h),
                        reorder, lambda: None,
                    )
            # the ledger itself always gathers (cheap [R, Lp] rolls)
            anc_hist[:] = group_sel(anc_hist[:], off, axis=0)

        if probe == "noreorder":
            pass
        elif probe != "none" or _FORCE_EAGER:
            do_reorder()
        else:
            # off == 0 everywhere ⇒ every gather (caches AND ledger) is the
            # identity: skip the whole sweep
            jax.lax.cond(jnp.max(off) > 0, do_reorder, lambda: None)

        return s + 1, finished, new_cur, new_scores

    def cond(carry):
        s, finished, _, _ = carry
        if probe != "none":
            # probes ablate math, so scores/argmaxes are garbage — pin the
            # step count to the full cap so probe timings are comparable
            return s < max_length
        return (s < max_length) & (jnp.min(finished) < 1)

    finished0 = tile_beams(row_pad[0], 0).astype(jnp.int32)    # [R, 1]
    if k_true < kb:
        finished0 = jnp.maximum(finished0, (q_iota >= k_true).astype(jnp.int32))
    init = (
        jnp.int32(0),
        finished0,
        jnp.full((r, 1), bos_id, jnp.int32),
        jnp.where(q_iota == 0, 0.0, NEG_INF),                  # only slot 0 live
    )
    _, _, _, scores = jax.lax.while_loop(cond, body, init)
    tok_out[:] = tok_hist[:]
    score_out[:] = scores


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_length", "beam_size", "bos_id", "eos_id", "pad_id",
        "parity_unmasked_cross", "cache_dtype", "rows_per_cell", "probe",
        "interpret",
    ),
)
def fused_beam_search_decode(
    params: dict,
    cfg,
    encoder_out: jnp.ndarray,
    encoder_mask: Optional[jnp.ndarray],
    embedding_table,
    classifier_kernel,
    classifier_bias: jnp.ndarray,
    max_length: int,
    *,
    beam_size: int = 4,
    bos_id: int = 0,
    eos_id: int = 1,
    pad_id: int = 2,
    parity_unmasked_cross: bool = False,
    cache_dtype: Optional[str] = None,
    rows_per_cell: Optional[int] = None,
    probe: str = "none",
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whole beam decode in one Pallas kernel.

    ``params`` is the DECODER param tree.  Returns ``(generated
    [B, K, max_length], scores [B, K])`` — the caller applies the final
    length-penalty/best-beam law (shared with the XLA path in
    decode/beam.py).

    A FULLY int8-quantized weight tree (ops/quant.py leaves on every matmul
    weight) is served VMEM-RESIDENT in int8 with use-site dequantization —
    exactly the XLA dequantize-then-matmul values, at ~4× less weight VMEM
    (which directly buys bigger cells at the VMEM-bound K=8 point); a
    partially quantized tree is dequantized on the host and runs the float
    kernel.  Non-power-of-two beam widths run on the next power-of-two row
    layout with per-step-killed dead tail slots (exact width-K semantics).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from telugu_asr_tpu.ops.attention import make_cross_attention_cache
    from telugu_asr_tpu.ops.pallas.decode_fused import tree_fully_quantized
    from telugu_asr_tpu.ops.quant import dequantize_array, is_quantized_leaf
    from telugu_asr_tpu.ops.rope import rope_inv_freq, rope_rot_dim

    assert fused_beam_supported(cfg, beam_size), (
        "config/beam_size outside the fused beam kernel's support"
    )
    nb, d, h, dh = cfg.num_blocks, cfg.d_model, cfg.num_heads, cfg.head_dim
    k_true = beam_size
    kb = _next_pow2(beam_size)
    true_batch, t_enc, _ = encoder_out.shape
    quantized = tree_fully_quantized(params, embedding_table, classifier_kernel)

    def deq(leaf):
        if is_quantized_leaf(leaf):
            return dequantize_array(leaf["q8"], leaf["scale"])
        return leaf

    # ---- group padding: whole utterance groups per cell ---------------------
    mult = _lcm8(kb)
    groups_per_tile = mult // kb
    batch_g = _round_up(true_batch, groups_per_tile)
    if batch_g != true_batch:
        pad_rows = [(0, batch_g - true_batch)]
        encoder_out = jnp.pad(encoder_out, pad_rows + [(0, 0), (0, 0)])
        if encoder_mask is not None:
            encoder_mask = jnp.pad(encoder_mask, pad_rows + [(0, 0)])
    flat = batch_g * kb

    lp = _round_up(max_length + 1, SEG)
    tc = _round_up(t_enc, SEG)
    dpad = _round_up(d, LANE_TILE)
    emb = embedding_table["q8"] if quantized else deq(embedding_table)
    vocab = emb.shape[0]
    vp = _round_up(vocab, LANE_TILE)

    # ---- stacked float weights ----------------------------------------------
    blocks = params["blocks"]

    def get(blk, path):
        return functools.reduce(lambda t, k_: t[k_], path, blk)

    def stack(path):
        return jnp.stack([deq(get(blk, path)) for blk in blocks])

    def stack_q(path):
        """int8 stack [NB, ..., C] + per-output-channel scales [NB, 1, C]."""
        leaves = [get(blk, path) for blk in blocks]
        q = jnp.stack([l["q8"] for l in leaves])
        s = jnp.stack([l["scale"] for l in leaves])[:, None, :]
        return q, s

    if quantized:
        wq, wq_s = stack_q(["masked_mhsa", "mha", "query_kernel"])
        wk, wk_s = stack_q(["masked_mhsa", "mha", "key_kernel"])
        wv, wv_s = stack_q(["masked_mhsa", "mha", "value_kernel"])
        wo, wo_s = stack_q(["masked_mhsa", "mha", "projection_kernel"])
        wcq, wcq_s = stack_q(["cross_attention", "mha", "query_kernel"])
        wco, wco_s = stack_q(["cross_attention", "mha", "projection_kernel"])
        w1, w1_s = stack_q(["ffn", "dense1", "kernel"])
        w2r, w2_s = stack_q(["ffn", "dense2", "kernel"])
    else:
        wq = stack(["masked_mhsa", "mha", "query_kernel"])
        wk = stack(["masked_mhsa", "mha", "key_kernel"])
        wv = stack(["masked_mhsa", "mha", "value_kernel"])
        wo = stack(["masked_mhsa", "mha", "projection_kernel"])
        wcq = stack(["cross_attention", "mha", "query_kernel"])
        wco = stack(["cross_attention", "mha", "projection_kernel"])
        w1 = stack(["ffn", "dense1", "kernel"])
        w2r = stack(["ffn", "dense2", "kernel"])
    ln1g = stack(["masked_mhsa", "ln", "gamma"])[:, None, :]
    ln1b = stack(["masked_mhsa", "ln", "beta"])[:, None, :]
    ln2g = stack(["cross_attention", "ln", "gamma"])[:, None, :]
    ln2b = stack(["cross_attention", "ln", "beta"])[:, None, :]
    ln3g = stack(["ffn", "ln", "gamma"])[:, None, :]
    ln3b = stack(["ffn", "ln", "beta"])[:, None, :]
    b1 = stack(["ffn", "dense1", "bias"])
    b2 = stack(["ffn", "dense2", "bias"])[:, None, :]
    if dpad != d:
        wcq = jnp.pad(wcq, [(0, 0), (0, 0), (0, dpad - d)])
        wco = jnp.pad(wco, [(0, 0), (0, dpad - d), (0, 0)])
        if quantized:
            wcq_s = jnp.pad(wcq_s, [(0, 0), (0, 0), (0, dpad - d)],
                            constant_values=1.0)
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
        emb_p = jnp.pad(embedding_table["q8"], [(0, vp - vocab), (0, 0)])
        emb_s = embedding_table["scale"][None, :]                      # [1, D]
        cls_w = jnp.pad(classifier_kernel["q8"], [(0, 0), (0, vp - vocab)])
        cls_s = jnp.pad(classifier_kernel["scale"], [(0, vp - vocab)],
                        constant_values=1.0)[None, :]                  # [1, Vp]
    else:
        emb_p = jnp.pad(emb, [(0, vp - vocab), (0, 0)])
        cls_w = jnp.pad(deq(classifier_kernel), [(0, 0), (0, vp - vocab)])
    cls_b = jnp.pad(classifier_bias[None, :], [(0, 0), (0, vp - vocab)],
                    constant_values=-1e30)
    ones_vp = jnp.ones((vp, vp), jnp.float32)

    rot_dim = rope_rot_dim(dh)
    inv_freq = np.asarray(rope_inv_freq(dh))
    freq_np = _freq_lanes(d, dh, inv_freq, rot_dim)
    freq = jnp.asarray(freq_np)
    evenm = jnp.asarray(_even_mask(d))
    onesb = jnp.asarray(_ones_block(d, dh))
    freq_c = jnp.asarray(np.pad(freq_np, [(0, 0), (0, dpad - d)]))
    evenm_c = jnp.asarray(_even_mask(dpad))
    onesb_c = jnp.asarray(_ones_block(dpad, dh))
    k_perm = None if rot_dim == dh else _rope_inplace_perm(d, dh, rot_dim)

    # ---- cross caches: ONE copy per utterance (beams share them — the
    # kernel tiles across the K beam rows at use) ----------------------------
    cks, cvs = [], []
    for blk in blocks:
        mha = {k_: deq(v_) for k_, v_ in blk["cross_attention"]["mha"].items()}
        cc = make_cross_attention_cache(mha, encoder_out, h)
        for arrs, kk in ((cks, "k"), (cvs, "v")):
            a = cc[kk].reshape(batch_g, d, t_enc)
            if kk == "k" and k_perm is not None:
                a = a[:, k_perm, :]
            a = a.transpose(2, 0, 1)             # [T, G, D]
            arrs.append(jnp.pad(a, [(0, tc - t_enc), (0, 0), (0, dpad - d)]))
    crossk_f = jnp.stack(cks)
    crossv_f = jnp.stack(cvs)

    cols = jnp.arange(tc)[None, :]
    if parity_unmasked_cross or encoder_mask is None:
        cross_valid = jnp.broadcast_to(cols < t_enc, (batch_g, tc))
        qzero = jnp.zeros((batch_g,), jnp.float32)
    else:
        em = encoder_mask.astype(bool)
        n_valid = jnp.sum(em.astype(jnp.int32), axis=-1)
        empty = n_valid == 0
        base = jnp.pad(em, [(0, 0), (0, tc - t_enc)])
        cross_valid = jnp.where(empty[:, None], cols < t_enc, base)
        qzero = empty.astype(jnp.float32)
    cross_valid_t = cross_valid.astype(jnp.float32).T[:, :, None]   # [Tc, G, 1]
    qzero_t = qzero[None, :, None]                                  # [1, G, 1]
    row_pad_t = (jnp.arange(batch_g) >= true_batch).astype(jnp.float32)[None, :, None]

    # ---- dtype + cell grouping ----------------------------------------------
    weight_arrays = [emb_p, cls_w, ones_vp, onesb, onesb_c,
                     wq, wk, wv, wo, wcq, wco, w1a, w1b_, w2]
    if quantized:
        scale_arrays = [emb_s, cls_s, wq_s, wk_s, wv_s, wo_s, wcq_s, wco_s,
                        w1a_s, w1b_s, w2_s]
        weight_arrays = weight_arrays + scale_arrays
    weight_bytes = sum(
        int(np.prod(a.shape)) * jnp.dtype(a.dtype).itemsize for a in weight_arrays
    )
    if cache_dtype is None and rows_per_cell is None:
        ladder = [(None, 4), ("bfloat16", 2)]
        rows_by = [
            (max(_pick_rows_beam(flat, kb, nb, d, lp, tc, vp, bytes_,
                                 weight_bytes, dd) for dd in (True, False)),
             name)
            for name, bytes_ in ladder
        ]
        best_rows = max(rw for rw, _ in rows_by)
        for rw, name in rows_by:
            if rw == best_rows:
                cache_dtype = name
                break
    cdtype = jnp.dtype(cache_dtype) if cache_dtype else jnp.dtype("float32")

    # Prefer the deduped cross layout (K× smaller scratch + DMA) whenever it
    # reaches the same cell size; the duplicated layout covers Gc < 8 cells
    # (the blocked-sublane law forbids sub-8 cross rows per cell).
    rows_dedup = _pick_rows_beam(flat, kb, nb, d, lp, tc, vp,
                                 cdtype.itemsize, weight_bytes, True)
    rows_dup = _pick_rows_beam(flat, kb, nb, d, lp, tc, vp,
                               cdtype.itemsize, weight_bytes, False)
    if rows_per_cell is not None:
        rows = rows_per_cell
        dedup = rows % (8 * kb) == 0 and rows // kb >= 8
    else:
        dedup = rows_dedup >= rows_dup
        rows = rows_dedup if dedup else rows_dup
    if rows == 0:
        raise ValueError(
            f"fused beam decode does not fit VMEM: d_model={d} K={kb} "
            f"cap={max_length} t_enc={t_enc} cache={cdtype} — fall back to "
            "the XLA beam path (auto-resolve checks fused_beam_fits)"
        )
    assert flat % rows == 0 and rows % kb == 0
    n_cells = flat // rows
    gc = rows // kb  # utterance groups per cell
    cross_rows = gc if dedup else rows

    crossk_f = crossk_f.astype(cdtype)
    crossv_f = crossv_f.astype(cdtype)

    def cell_major(a):
        # [NB, Tc, G, Dp] → [n_cells, NB, Tc, Gc, Dp]; dup mode pre-tiles
        # each cell's Gc utterance rows K times in the kernel's beam-major
        # row order (q*Gc + g)
        a = jnp.moveaxis(a.reshape(nb, tc, n_cells, gc, dpad), 2, 0)
        if not dedup:
            a = jnp.concatenate([a] * kb, axis=3)
        return a

    crossk = cell_major(crossk_f)
    crossv = cell_major(crossv_f)

    if not dedup:
        # per-row side inputs also go rows-wide, beam-major per cell
        def tile_rows_host(x):  # [.., G, 1] → [.., n_cells*rows, 1]
            t_, _, _ = x.shape
            xc = x.reshape(t_, n_cells, gc, 1)
            xc = jnp.concatenate([xc] * kb, axis=2)
            return xc.reshape(t_, flat, 1)

        cross_valid_t = tile_rows_host(cross_valid_t)
        qzero_t = tile_rows_host(qzero_t)
        row_pad_t = tile_rows_host(row_pad_t)

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda c, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    in_specs = [
        const(emb_p.shape), const(cls_w.shape), const(cls_b.shape),
        const(ones_vp.shape),
        const(freq.shape), const(evenm.shape), const(onesb.shape),
        const(freq_c.shape), const(evenm_c.shape), const(onesb_c.shape),
        const(wq.shape), const(wk.shape), const(wv.shape), const(wo.shape),
        const(ln1g.shape), const(ln1b.shape),
        const(wcq.shape), const(wco.shape),
        const(ln2g.shape), const(ln2b.shape),
        const(w1a.shape), const(w1b_.shape), const(b1a.shape), const(b1b.shape),
        const(w2.shape), const(b2.shape),
        const(ln3g.shape), const(ln3b.shape),
        *([const(a.shape) for a in scale_arrays] if quantized else []),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((tc, cross_rows, 1), lambda c: (0, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cross_rows, 1), lambda c: (0, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cross_rows, 1), lambda c: (0, c, 0),
                     memory_space=pltpu.VMEM),
    ]

    kernel = functools.partial(
        _kernel,
        n_blocks=nb,
        head_dim=dh,
        k_beams=kb,
        k_true=k_true,
        max_length=max_length,
        vocab=vocab,
        bos_id=bos_id,
        eos_id=eos_id,
        pad_id=pad_id,
        dedup=dedup,
        quantized=quantized,
        # development-only ablation hook (tools/probe_fused_costs.py --beam):
        # output is numerically WRONG under any probe != "none"
        probe=probe,
    )

    tokens2, scores2 = pl.pallas_call(
        kernel,
        grid=(n_cells,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((rows, lp), lambda c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda c: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((flat, lp), jnp.int32),
            jax.ShapeDtypeStruct((flat, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, lp), jnp.int32),
            pltpu.VMEM((rows, lp), jnp.int32),   # ancestor ledger
            pltpu.VMEM((nb, lp, rows, d), cdtype),
            pltpu.VMEM((nb, lp, rows, d), cdtype),
            pltpu.VMEM((nb, tc, cross_rows, dpad), cdtype),
            pltpu.VMEM((nb, tc, cross_rows, dpad), cdtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        emb_p, cls_w, cls_b, ones_vp,
        freq, evenm, onesb, freq_c, evenm_c, onesb_c,
        wq, wk, wv, wo, ln1g, ln1b,
        wcq, wco, ln2g, ln2b,
        w1a, w1b_, b1a, b1b, w2, b2, ln3g, ln3b,
        *(scale_arrays if quantized else ()),
        crossk, crossv, cross_valid_t, qzero_t, row_pad_t,
    )

    # un-permute the beam-major cell rows (cell*R + q*Gc + g) back to
    # utterance-major [G, K, ...]; drop the dead pow2-padding slots (winners
    # land in slot order, so the first k_true slots are the true beams)
    tokens = jnp.transpose(
        tokens2.reshape(n_cells, kb, gc, lp), (0, 2, 1, 3)
    ).reshape(batch_g, kb, lp)[:true_batch, :k_true]
    generated = tokens[:, :, 1:max_length + 1]
    scores = jnp.transpose(
        scores2.reshape(n_cells, kb, gc), (0, 2, 1)
    ).reshape(batch_g, kb)[:true_batch, :k_true]
    return generated, scores
