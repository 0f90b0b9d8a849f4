"""Fused log-mel frontend as a single Pallas TPU kernel.

One kernel does frame -> windowed-DFT (MXU matmul) -> magnitude -> mel
projection (MXU) -> log, entirely in VMEM, with the waveform streamed from
HBM block by block. Compared to the XLA frontend (ops/frontend.py) this:

* removes the materialized (n_frames, 400) frame matrix from HBM — framing
  happens in VMEM via a reshape/stack trick (400 = 160+160+80, so a frame
  block is three shifted row-slices of the hop-reshaped signal, no gather);
* keeps the DFT/mel constants VMEM-resident across grid steps;
* fuses the magnitude and log elementwise stages into the matmul pipeline.

Numerics match ops/frontend.py to float32 rounding (tests/test_pallas.py).
Select it with ``ChunkClassifier(..., frontend='pallas')``; the XLA path
remains the default (the model is transfer-bound on current hardware, and
this environment's remote Mosaic compile service is unreliable — the kernel
is validated in interpreter mode).
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


@lru_cache(maxsize=4)
def _constants(cfg: FrontendConfig):
    w_re, w_im = mel_lib.windowed_rdft_matrices(cfg.window_samples,
                                                cfg.fft_length)
    dft = np.concatenate([w_re, w_im], axis=1).astype(np.float32)  # (400, 514)
    # Pack the 400-tap operand as three HOP-row banks (the third zero-padded
    # to HOP): the windowed DFT of hop-strided frames then becomes three
    # shifted (F, HOP) x (HOP, bins) matmuls — no lane-dim concatenation,
    # which Mosaic handles poorly.
    banks = np.zeros((3 * HOP, dft.shape[1]), np.float32)
    banks[:WINDOW] = dft
    mel = mel_lib.mel_weight_matrix(cfg.mel_bands, cfg.fft_bins,
                                    cfg.sample_rate, cfg.mel_min_hz,
                                    cfg.mel_max_hz).astype(np.float32)
    return banks, mel


def _kernel(wave_hbm, dft_ref, mel_ref, out_ref, scratch, sem,
            *, log_offset, fft_bins):
    # Successive blocks of BLOCK_FRAMES frames overlap by one window tail
    # (240 samples), which standard blocked indexing can't express — so the
    # waveform stays in HBM and each grid step DMAs its overlapping slice
    # into VMEM scratch.
    k = pl.program_id(0)
    start = pl.multiple_of(k * BLOCK_FRAMES * HOP, BLOCK_FRAMES * HOP)
    block_samples = (BLOCK_FRAMES + 2) * HOP
    dma = pltpu.make_async_copy(
        wave_hbm.at[pl.ds(start, block_samples)], scratch, sem)
    dma.start()
    dma.wait()

    rows = scratch[:].reshape(BLOCK_FRAMES + 2, HOP)
    # frame f covers samples [f*HOP, f*HOP + WINDOW) = hop-rows f, f+1 and
    # the head of f+2; with the DFT operand split into three HOP-row banks
    # the whole framing+DFT is three shifted matmuls on the MXU
    spectrum = (
        jnp.dot(rows[0:BLOCK_FRAMES], dft_ref[0:HOP],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(rows[1:BLOCK_FRAMES + 1], dft_ref[HOP:2 * HOP],
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(rows[2:BLOCK_FRAMES + 2], dft_ref[2 * HOP:3 * HOP],
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST))
    re = spectrum[:, :fft_bins]
    im = spectrum[:, fft_bins:]
    magnitude = jnp.sqrt(re * re + im * im)
    mel_spec = jnp.dot(magnitude, mel_ref[:],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    out_ref[:] = jnp.log(mel_spec + log_offset)


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
    # each block reads (BLOCK_FRAMES + 2) hop rows starting at block * BLOCK_FRAMES
    needed = (n_blocks * BLOCK_FRAMES + 2) * HOP
    if needed > n:
        waveform = jnp.pad(waveform, (0, needed - n))

    dft, mel = _constants(cfg)
    block_samples = (BLOCK_FRAMES + 2) * HOP

    out = pl.pallas_call(
        partial(_kernel, log_offset=cfg.log_offset, fft_bins=cfg.fft_bins),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # waveform stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # DFT constant, resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mel constant, resident
        ],
        out_specs=pl.BlockSpec((BLOCK_FRAMES, cfg.mel_bands),
                               lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK_FRAMES,
                                        cfg.mel_bands), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_samples,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(waveform, jnp.asarray(dft), jnp.asarray(mel))
    return out[:n_frames]
