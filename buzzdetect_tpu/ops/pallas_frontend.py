"""Fused log-mel frontend as a single Pallas TPU kernel.

One kernel does frame -> windowed-DFT (MXU matmul) -> magnitude -> mel
projection (MXU) -> log, entirely in VMEM, with the waveform streamed from
HBM block by block. Compared to the XLA frontend (ops/frontend.py) this:

* removes the materialized (n_frames, 400) frame matrix from HBM — framing
  happens via the bank trick (400 = 160+160+80, so a frame block is three
  hop-shifted row views of the signal, no gather);
* keeps the DFT/mel constants VMEM-resident across grid steps;
* fuses the magnitude and log elementwise stages into the matmul pipeline.

Mosaic layout rules shaped the design (v5e, 2026-era toolchain), found by
compiling on real hardware:
* in-kernel 1-D -> 2-D shape casts don't lay out (`tpu.reshape
  vector<41280> -> vector<258x160>` fails infer-vector-layout);
* `tpu.memref_slice` shapes must be tile-aligned in BOTH trailing dims —
  multiples of 8 on the sublane dim AND 128 on the lane dim (a (256,160)
  row-block DMA is rejected for the 160).
So: the host passes three hop-shifted (rows, HOP) views zero-padded to 256
lanes; the DFT banks pad to 256 rows (zero rows multiply the lane padding
away) and 1024 columns (re in [0,512), im in [512,1024), each zero-padded
past the 257 real bins); the mel matrix pads to (512, 128). Every DMA and
every vector slice in the kernel is then tile-aligned, and all the padding
is annihilated by zero rows/columns in the constants. The arithmetic
overhead lands on the MXU, which is >99% idle in this model anyway.

Numerics match ops/frontend.py to float32 rounding: tests/test_pallas.py
(interpreter mode) and compiled-on-TPU via ``bench.py --frontend pallas`` /
the probe in tools/.

History: this kernel replaced the original gather-based XLA frontend (343 ms
per 960 s chunk on v5e — ~95% of the whole classify graph) at 16.9 ms, a
20x win, and was briefly the TPU default. Porting its hop-bank trick back
into plain XLA (ops/frontend.py::_dft_mel_constants) then beat it: 13.6 ms
f32 / 6.0 ms bf16, because XLA fuses the banked matmuls into the downstream
stack with no DMA orchestration overhead. The kernel remains selectable
(``frontend='pallas'``) as an independent implementation of the same
numerics and the fallback should XLA's fusion ever regress.
"""

from functools import partial, lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from buzzdetect_tpu.ops import mel as mel_lib
from buzzdetect_tpu.ops.frontend import FrontendConfig

# frames per grid step; frame geometry is fixed by YAMNet (400/160/512)
BLOCK_FRAMES = 256
WINDOW = 400
HOP = 160
LANES = 128
HOP_PADDED = 256          # HOP rounded up to the lane tile
SPEC_HALF = 512           # re/im each padded to 4 lane tiles (>= 257 bins)
MEL_PADDED = 128          # mel bands padded to one lane tile


def _constants(cfg: FrontendConfig):
    # cache on the SPECTRAL fields only: patch framing (framehop) plays no
    # part in these constants, and keying on the whole config would rebuild
    # and store the ~1.6 MB set once per framehop variant
    return _constants_impl(cfg.window_samples, cfg.fft_length, cfg.fft_bins,
                           cfg.mel_bands, cfg.sample_rate, cfg.mel_min_hz,
                           cfg.mel_max_hz)


@lru_cache(maxsize=4)
def _constants_impl(window_samples, fft_length, fft_bins, mel_bands,
                    sample_rate, mel_min_hz, mel_max_hz):
    w_re, w_im = mel_lib.windowed_rdft_matrices(window_samples, fft_length)
    # Pack the 400-tap operand as three HOP-row banks (the third zero-padded
    # to HOP): the windowed DFT of hop-strided frames then becomes three
    # shifted (F, HOP) x (HOP, bins) matmuls — no lane-dim concatenation,
    # which Mosaic handles poorly. Banks pad to (HOP_PADDED, 2*SPEC_HALF):
    # rows >= HOP are zero (they meet the views' lane padding), re occupies
    # cols [0, fft_bins), im cols [SPEC_HALF, SPEC_HALF + fft_bins).
    banks = np.zeros((3, HOP_PADDED, 2 * SPEC_HALF), np.float32)
    for b in range(3):
        lo, hi = b * HOP, min((b + 1) * HOP, WINDOW)
        banks[b, :hi - lo, :fft_bins] = w_re[lo:hi]
        banks[b, :hi - lo, SPEC_HALF:SPEC_HALF + fft_bins] = w_im[lo:hi]
    mel = np.zeros((SPEC_HALF, MEL_PADDED), np.float32)
    mel[:fft_bins, :mel_bands] = mel_lib.mel_weight_matrix(
        mel_bands, fft_bins, sample_rate, mel_min_hz,
        mel_max_hz).astype(np.float32)
    return banks, mel


def _kernel(w0_hbm, w1_hbm, w2_hbm, b0_ref, b1_ref, b2_ref, mel_ref,
            out_ref, s0, s1, s2, sem0, sem1, sem2, *, log_offset):
    # Frame f covers hop rows f, f+1 and the head of f+2. The three inputs
    # are the same signal shifted by 0/1/2 hop rows, so row f of each view
    # delivers exactly those three banks — every DMA below is a tile-aligned
    # BLOCK_FRAMES x HOP_PADDED block.
    k = pl.program_id(0)
    start = pl.multiple_of(k * BLOCK_FRAMES, BLOCK_FRAMES)
    dmas = []
    for src, dst, sem in ((w0_hbm, s0, sem0), (w1_hbm, s1, sem1),
                          (w2_hbm, s2, sem2)):
        dma = pltpu.make_async_copy(
            src.at[pl.ds(start, BLOCK_FRAMES), :], dst, sem)
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()

    hi = jax.lax.Precision.HIGHEST
    spectrum = (
        jnp.dot(s0[:], b0_ref[:], preferred_element_type=jnp.float32,
                precision=hi)
        + jnp.dot(s1[:], b1_ref[:], preferred_element_type=jnp.float32,
                  precision=hi)
        + jnp.dot(s2[:], b2_ref[:], preferred_element_type=jnp.float32,
                  precision=hi))                       # (F, 2*SPEC_HALF)
    re = spectrum[:, :SPEC_HALF]
    im = spectrum[:, SPEC_HALF:]
    magnitude = jnp.sqrt(re * re + im * im)            # (F, SPEC_HALF)
    mel_spec = jnp.dot(magnitude, mel_ref[:],
                       preferred_element_type=jnp.float32, precision=hi)
    out_ref[:] = jnp.log(mel_spec + log_offset)        # (F, MEL_PADDED)


def log_mel_spectrogram_pallas(waveform: jnp.ndarray,
                               cfg: FrontendConfig) -> jnp.ndarray:
    """Padded 1-D waveform -> (n_frames, mel_bands) log-mel, Pallas-fused.

    Output matches ops.frontend.log_mel_spectrogram for the same input.
    """
    assert cfg.window_samples == WINDOW and cfg.hop_samples == HOP, \
        'pallas kernel is specialized to the YAMNet 400/160 frame geometry'
    waveform = waveform.astype(jnp.float32)
    n = waveform.shape[-1]
    n_frames = 1 + (n - WINDOW) // HOP

    n_blocks = -(-n_frames // BLOCK_FRAMES)  # cdiv
    # every shifted view needs n_blocks*BLOCK_FRAMES full hop rows
    total_rows = n_blocks * BLOCK_FRAMES
    needed = (total_rows + 2) * HOP
    if needed > n:
        waveform = jnp.pad(waveform, (0, needed - n))

    banks, mel = _constants(cfg)
    views = [
        jnp.pad(jax.lax.dynamic_slice(
            waveform, (p * HOP,),
            (total_rows * HOP,)).reshape(total_rows, HOP),
            ((0, 0), (0, HOP_PADDED - HOP)))
        for p in range(3)
    ]

    out = pl.pallas_call(
        partial(_kernel, log_offset=cfg.log_offset),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # shifted views stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # DFT banks, resident
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mel constant, resident
        ],
        out_specs=pl.BlockSpec((BLOCK_FRAMES, MEL_PADDED),
                               lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total_rows, MEL_PADDED),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BLOCK_FRAMES, HOP_PADDED), jnp.float32),
            pltpu.VMEM((BLOCK_FRAMES, HOP_PADDED), jnp.float32),
            pltpu.VMEM((BLOCK_FRAMES, HOP_PADDED), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(views[0], views[1], views[2],
      jnp.asarray(banks[0]), jnp.asarray(banks[1]), jnp.asarray(banks[2]),
      jnp.asarray(mel))
    return out[:n_frames, :cfg.mel_bands]
