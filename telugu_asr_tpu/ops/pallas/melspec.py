"""Fused log-mel + SpecAugment Pallas TPU kernel — the north-star featurizer
(SURVEY §2.3.1-2): one HBM pass from preprocessed audio to augmented log-mel.

Per grid cell (example b, frame-tile t) the kernel:

1. DMAs the tile's audio span from HBM into VMEM.  The host pre-arranges
   audio into even/odd ATOM PLANES (atom = gcd(hop, frame) = 80 samples,
   padded to 128 lanes for DMA alignment): with hop=160 and frame=400,
   frame ``i``'s chunk ``j`` is plane ``j%2`` row ``i + j//2`` — every
   chunk is a contiguous 2-D slice, no gather/strided access in-kernel;
2. computes the windowed DFT as a SUM over the 5 atom chunks of
   ``chunk_j[128, 128] @ DFTW_j[128, 2*257]`` (periodic-Hann window folded
   into the DFT rows host-side; padding rows zero) accumulating in register
   — MXU matmuls at ``Precision.HIGHEST`` (bf16 rounding under the DFT's
   cancellation costs ~0.1 in log10 output);
3. power = re²+im², then the mel matmul [128, 257] @ [257, 80];
4. log10 with floor, zeroes frames ≥ the example's valid frame count, and
   applies SpecAugment bands (parameters sampled host-side per example so
   masks stay consistent across tiles) — all in-register before the single
   store to HBM.

The float32 DFT-as-matmul is numerically equivalent to the rFFT within
~1e-3 in log10 domain (asserted in tests); host-side peak-normalization and
preemphasis happen outside (they are one fused elementwise pass under jit).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from telugu_asr_tpu.audio.mel import linear_to_mel_weight_matrix

FRAMES_PER_TILE = 128

__all__ = ["fused_log_mel", "pallas_available"]


def pallas_available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401

        return True
    except Exception:  # pragma: no cover
        return False


@functools.lru_cache(maxsize=8)
def _constants(frame_length: int, frame_step: int, fft_length: int, num_mel_bins: int,
               sample_rate: int, lower_edge_hertz: float, upper_edge_hertz: float,
               atom_pad: int):
    n = np.arange(frame_length, dtype=np.float64)
    window = (0.5 - 0.5 * np.cos(2.0 * np.pi * n / frame_length)).astype(np.float32)
    bins = fft_length // 2 + 1
    k = np.arange(bins, dtype=np.float64)[None, :]
    t = np.arange(frame_length, dtype=np.float64)[:, None]
    angle = -2.0 * np.pi * t * k / fft_length
    # window folded into the DFT rows: (diag(w) @ [cos | sin]); rows are laid
    # out per atom padded to ``atom_pad`` lanes (DMA lane alignment), the
    # padding rows being zero so padded lanes contribute nothing.
    dftw = (
        window[:, None].astype(np.float64)
        * np.concatenate([np.cos(angle), np.sin(angle)], axis=1)
    ).astype(np.float32)  # [frame_length, 2*bins]
    atom = int(np.gcd(frame_step, frame_length))
    apf = frame_length // atom
    dft = np.zeros((apf * atom_pad, dftw.shape[1]), np.float32)
    for j in range(apf):
        dft[j * atom_pad : j * atom_pad + atom] = dftw[j * atom : (j + 1) * atom]
    mel = linear_to_mel_weight_matrix(
        num_mel_bins, bins, sample_rate, lower_edge_hertz, upper_edge_hertz
    )
    return window, dft, mel


def _kernel(
    # scalar-prefetch refs
    feat_lengths_ref,  # [B] valid frame counts
    aug_ref,  # [B, 4] int32: f0, f, t0, t  (negative f/t => no mask)
    # tensor refs
    planes_ref,  # [B, stride, plane_atoms, atom] in ANY/HBM (even/odd planes)
    dft_ref,  # [frame_length, 2*bins] (window pre-folded)
    mel_ref,  # [bins, num_mel]
    out_ref,  # [1, FRAMES_PER_TILE, num_mel] block
    scratch_ref,  # [stride, rows, atom] VMEM
    sem,
    *,
    frame_length: int,
    frame_step: int,
    num_bins: int,
    num_mel: int,
    output_floor: float,
    atoms_per_frame: int,
    atom: int,
    atom_pad: int,
    stride: int,
    rows: int,
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    t = pl.program_id(1)

    copy = pltpu.make_async_copy(
        planes_ref.at[b, :, pl.ds(t * FRAMES_PER_TILE, rows), :], scratch_ref, sem
    )
    copy.start()
    copy.wait()

    # Frame i's chunk j is plane[j % stride] row (i + j // stride): every
    # chunk is a CONTIGUOUS 2-D slice — the even/odd plane layout was built
    # host-side exactly so no strided access or reshape happens here.  The
    # windowed DFT of a frame is the SUM over chunks of chunk_j @ DFTW_j
    # (window pre-folded into the DFT rows host-side), so no concat either:
    # five [128, atom] x [atom, 2*bins] MXU matmuls accumulating in register.
    # Precision.HIGHEST: the DFT has heavy cancellation — default bf16 MXU
    # rounding costs ~0.1 in log10 output; fp32 (3-pass) matches the rFFT.
    spectrum = jnp.zeros((FRAMES_PER_TILE, 2 * num_bins), jnp.float32)
    for j in range(atoms_per_frame):
        plane = scratch_ref[j % stride]
        chunk = plane[j // stride : j // stride + FRAMES_PER_TILE, :]
        dftw_j = dft_ref[j * atom_pad : (j + 1) * atom_pad, :]
        spectrum = spectrum + jnp.dot(
            chunk, dftw_j,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    re = spectrum[:, :num_bins]
    im = spectrum[:, num_bins:]
    power = re * re + im * im
    mel = jnp.dot(
        power, mel_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    logmel = jnp.log(jnp.maximum(mel, output_floor)) * np.float32(1.0 / np.log(10.0))

    # valid-frame masking (global frame index)
    frame_idx = t * FRAMES_PER_TILE + jax.lax.broadcasted_iota(
        jnp.int32, (FRAMES_PER_TILE, num_mel), 0
    )
    valid = frame_idx < feat_lengths_ref[b]

    # SpecAugment: frequency band [f0, f0+f), time band [t0, t0+t)
    f0 = aug_ref[b, 0]
    f = aug_ref[b, 1]
    t0 = aug_ref[b, 2]
    tt = aug_ref[b, 3]
    mel_idx = jax.lax.broadcasted_iota(jnp.int32, (FRAMES_PER_TILE, num_mel), 1)
    freq_masked = (mel_idx >= f0) & (mel_idx < f0 + f)
    time_masked = (frame_idx >= t0) & (frame_idx < t0 + tt)
    keep = valid & ~freq_masked & ~time_masked

    out_ref[0] = jnp.where(keep, logmel, 0.0)


def fused_log_mel(
    audio: jnp.ndarray,
    feat_lengths: jnp.ndarray,
    *,
    frame_length: int = 400,
    frame_step: int = 160,
    fft_length: int = 512,
    num_mel_bins: int = 80,
    sample_rate: int = 16000,
    lower_edge_hertz: float = 0.0,
    upper_edge_hertz: float = 8000.0,
    output_floor: float = 1e-9,
    num_frames: Optional[int] = None,
    aug_params: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused featurizer over PREPROCESSED audio (normalized + preemphasized).

    Args:
      audio: ``[B, N]`` float32.
      feat_lengths: ``[B]`` int32 valid frame counts.
      num_frames: total frames to produce (defaults to the max for N).
      aug_params: ``[B, 4]`` int32 (f0, f, t0, t) SpecAugment bands; pass
        negative widths (or None) to disable.

    Returns ``[B, T_pad, num_mel_bins]`` with ``T_pad`` rounded up to the
    frame tile; callers slice to their frame count.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    atom = int(np.gcd(frame_step, frame_length))
    atoms_per_frame = frame_length // atom
    stride = frame_step // atom
    batch, n = audio.shape
    if num_frames is None:
        num_frames = max(1 + (n - frame_length) // frame_step, 1)
    num_tiles = -(-num_frames // FRAMES_PER_TILE)
    t_pad = num_tiles * FRAMES_PER_TILE
    # Chunk j of a tile needs plane rows [tile_start + j//stride,
    # .. + FRAMES_PER_TILE); deepest chunk offset is (apf-1)//stride.
    # Rounded up to the 8-sublane DMA granule.
    rows = FRAMES_PER_TILE + (atoms_per_frame - 1) // stride
    rows = -(-rows // 8) * 8
    plane_atoms = (num_tiles - 1) * FRAMES_PER_TILE + rows
    needed = plane_atoms * stride * atom
    if n < needed:
        audio = jnp.pad(audio, [(0, 0), (0, needed - n)])
    elif n > needed:
        audio = audio[:, :needed]
    # Host-side plane layout: atoms [B, A, atom] → pad lanes to 128 →
    # planes [B, stride, A/stride, atom_pad]
    atom_pad = 128
    atoms_arr = audio.reshape(batch, plane_atoms * stride, atom)
    atoms_arr = jnp.pad(atoms_arr, [(0, 0), (0, 0), (0, atom_pad - atom)])
    planes = atoms_arr.reshape(batch, plane_atoms, stride, atom_pad).transpose(0, 2, 1, 3)

    window, dft, mel = _constants(
        frame_length, frame_step, fft_length, num_mel_bins, sample_rate,
        lower_edge_hertz, upper_edge_hertz, atom_pad,
    )
    num_bins = fft_length // 2 + 1
    if aug_params is None:
        aug_params = jnp.full((batch, 4), -1, jnp.int32)

    kernel = functools.partial(
        _kernel,
        frame_length=frame_length,
        frame_step=frame_step,
        num_bins=num_bins,
        num_mel=num_mel_bins,
        output_floor=output_floor,
        atoms_per_frame=atoms_per_frame,
        atom=atom,
        atom_pad=atom_pad,
        stride=stride,
        rows=rows,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # planes stay in HBM
            pl.BlockSpec(
                (atoms_per_frame * atom_pad, 2 * num_bins),
                lambda b, t, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((num_bins, num_mel_bins), lambda b, t, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, FRAMES_PER_TILE, num_mel_bins), lambda b, t, *_: (b, t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((stride, rows, atom_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, t_pad, num_mel_bins), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        feat_lengths.astype(jnp.int32),
        aug_params.astype(jnp.int32),
        planes.astype(jnp.float32),
        jnp.asarray(dft),
        jnp.asarray(mel),
    )
    return out
