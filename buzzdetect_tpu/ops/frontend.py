"""YAMNet log-mel patch frontend as a fused, jit-compiled JAX graph.

Pipeline (algorithm parity with reference `embedders/yamnet/features.py:22-108`,
redesigned for TPU):

    waveform (16 kHz f32)
      -> pad to integral patch count        [host-side static length math]
      -> windowed rDFT (Hann folded in) + magnitude
         [hop-banked: 3 shifted contiguous-reshape MXU matmuls — no frame
          gather, no (n_frames, 400) materialization]
      -> 64-bin HTK mel projection          [one MXU matmul]
      -> log(mel + 0.001)
      -> 96-frame patches at stride round(96 * framehop_prop)  [one gather]

All shapes are static functions of the (padded) waveform length, so each
(chunk_samples, framehop) pair compiles exactly once. The DFT trick replaces
the FFT with dense matmuls that XLA tiles directly onto the 128x128 systolic
array; real and imaginary banks are concatenated along columns so the MXU
runs one large matmul per bank instead of two small ones.

Everything runs in float32: the frontend feeds log-compression, and bfloat16
here would break the <=1e-3 score-parity contract (BASELINE.md).
"""

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from buzzdetect_tpu.ops import mel as mel_lib


@dataclass(frozen=True)
class FrontendConfig:
    """Frozen DSP hyperparameters (reference `embedders/yamnet/params.py:25-51`)."""
    sample_rate: int = 16000
    stft_window_seconds: float = 0.025
    stft_hop_seconds: float = 0.010
    mel_bands: int = 64
    mel_min_hz: float = 125.0
    mel_max_hz: float = 7500.0
    log_offset: float = 0.001
    patch_window_seconds: float = 0.96
    patch_hop_seconds: float = 0.48  # = patch_window_seconds * framehop_prop

    @property
    def window_samples(self) -> int:
        return int(round(self.sample_rate * self.stft_window_seconds))  # 400

    @property
    def hop_samples(self) -> int:
        return int(round(self.sample_rate * self.stft_hop_seconds))  # 160

    @property
    def fft_length(self) -> int:
        return 2 ** int(np.ceil(np.log2(self.window_samples)))  # 512

    @property
    def fft_bins(self) -> int:
        return self.fft_length // 2 + 1  # 257

    @property
    def patch_frames(self) -> int:
        return int(round(self.patch_window_seconds / self.stft_hop_seconds))  # 96

    @property
    def patch_hop_frames(self) -> int:
        # spectrogram rate is sample_rate / hop_samples (100 Hz)
        spect_rate = self.sample_rate / self.hop_samples
        return int(round(spect_rate * self.patch_hop_seconds))

    @property
    def patch_hop_samples(self) -> int:
        # MUST stay consistent with patch_hop_frames (which rounds): a
        # truncating int(seconds * rate) here landed one sample short of a
        # frame boundary at framehops like 1/3, silently dropping the final
        # patch of every chunk from analysis
        return self.patch_hop_frames * self.hop_samples

    def with_framehop(self, framehop_prop: float) -> 'FrontendConfig':
        import dataclasses
        cfg = dataclasses.replace(
            self, patch_hop_seconds=self.patch_window_seconds * framehop_prop)
        if cfg.patch_hop_frames < 1:
            raise ValueError(
                f'framehop_prop={framehop_prop} is below the spectrogram '
                f'resolution (one {self.stft_hop_seconds * 1000:.0f} ms '
                f'frame); the smallest usable value is '
                f'{self.stft_hop_seconds / self.patch_window_seconds:.4f}')
        # Snap the seconds value to the spectrogram grid: the graph extracts
        # patches every patch_hop_frames whole 10 ms frames, so when
        # 96*framehop_prop is not an integer (e.g. 0.1 -> 9.6 -> 10 frames)
        # the requested seconds would desynchronize result timestamps and
        # resume coverage from the frames the model actually analyzed.
        return dataclasses.replace(
            cfg, patch_hop_seconds=cfg.patch_hop_samples / cfg.sample_rate)


# --- static length math (host side) ----------------------------------------

def min_waveform_samples(cfg: FrontendConfig) -> int:
    """Samples needed for exactly one patch: one patch window plus the extra
    samples that complete the final STFT analysis window."""
    min_seconds = (cfg.patch_window_seconds
                   + cfg.stft_window_seconds - cfg.stft_hop_seconds)
    return int(min_seconds * cfg.sample_rate)


def num_patches(n_samples: int, cfg: FrontendConfig) -> int:
    """Patch count produced for a waveform of ``n_samples`` (pre-padding).

    The reference rule (`embedders/yamnet/features.py:82-108`): one patch
    for the minimum window, plus one per whole patch hop of remainder
    (rounded up). Additionally, trailing patches whose window would START
    at/after the end of the real samples are dropped — at sparse framehops
    (> 1, where the hop exceeds the patch window) the round-up would
    otherwise score a patch of 100% zero padding and emit a result row
    timestamped past the file's end.
    """
    if cfg.patch_hop_frames < 1:
        # with_framehop refuses these, but a hand-built config must fail
        # with the reason, not a ZeroDivisionError
        raise ValueError('patch hop is below one spectrogram frame')
    hop = cfg.patch_hop_samples
    extra = max(0, n_samples - min_waveform_samples(cfg))
    n = 1 + int(np.ceil(extra / hop))
    if n_samples > 0:
        n = min(n, (n_samples - 1) // hop + 1)
    return max(n, 1)


def padded_length(n_samples: int, cfg: FrontendConfig) -> int:
    """Length after zero-padding to an integral number of patch hops.

    Mirrors the two-part padding rule of the reference
    (`embedders/yamnet/features.py:82-108`): grow to the one-patch minimum,
    then round the remainder up to a whole number of patch hops. At sparse
    framehops the padded shape can frame one more (pure-padding) patch than
    ``num_patches`` reports — the pad-and-mask contract (``n_valid``)
    slices it off, like any other shape padding.
    """
    min_samples = max(n_samples, min_waveform_samples(cfg))
    after_first = min_samples - min_waveform_samples(cfg)
    hop = cfg.patch_hop_samples
    n_hops = int(np.ceil(after_first / hop)) if hop > 0 else 0
    return min_waveform_samples(cfg) + n_hops * hop


def num_stft_frames(n_padded: int, cfg: FrontendConfig) -> int:
    """STFT frame count for a padded waveform (no end-padding: drop remainder)."""
    return 1 + (n_padded - cfg.window_samples) // cfg.hop_samples


def pad_waveform(waveform: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """Zero-pad a 1-D waveform to an integral patch count (static shape)."""
    target = padded_length(waveform.shape[-1], cfg)
    pad = target - waveform.shape[-1]
    if pad == 0:
        return waveform
    widths = [(0, 0)] * (waveform.ndim - 1) + [(0, pad)]
    return jnp.pad(waveform, widths)


# --- constant operands ------------------------------------------------------

def _dft_mel_constants(cfg: FrontendConfig):
    """Hop-banked windowed-DFT operands and the mel matrix.

    Cached on the SPECTRAL fields only — patch framing (framehop) plays no
    part in these constants, and keying on the whole config would rebuild
    and store the ~1.6 MB set once per framehop variant."""
    return _dft_mel_constants_impl(
        cfg.window_samples, cfg.fft_length, cfg.hop_samples, cfg.mel_bands,
        cfg.fft_bins, cfg.sample_rate, cfg.mel_min_hz, cfg.mel_max_hz)


@lru_cache(maxsize=8)
def _dft_mel_constants_impl(window_samples, fft_length, hop_samples,
                            mel_bands, fft_bins, sample_rate, mel_min_hz,
                            mel_max_hz):
    """See _dft_mel_constants.

    The (400, 2*bins) fused DFT operand is split into hop-sized row banks
    (400 = 160+160+80, the last zero-padded to 160): the STFT of hop-strided
    frames then becomes three shifted (n_frames, hop) x (hop, 2*bins)
    matmuls over *contiguous reshapes* of the signal — no (n_frames, 400)
    gather is ever materialized. This is the same bank trick as the Pallas
    kernel (ops/pallas_frontend.py), expressed in plain XLA; it turned the
    frontend from the dominant cost of the whole classify graph (the gather
    formulation: 343 of ~344 ms per 960 s chunk on v5e) into the fastest
    implementation measured — 13.6 ms f32 / 6.0 ms bf16 per chunk, beating
    even the fused Pallas kernel (16.9 / 9.6 ms), because XLA fuses the
    banked matmuls straight into the downstream conv stack.
    """
    w_real, w_imag = mel_lib.windowed_rdft_matrices(window_samples,
                                                    fft_length)
    dft = np.concatenate([w_real, w_imag], axis=1)  # (400, 514)
    hop, win = hop_samples, window_samples
    n_banks = -(-win // hop)
    banks = np.zeros((n_banks, hop, dft.shape[1]), np.float32)
    for b in range(n_banks):
        lo, hi = b * hop, min((b + 1) * hop, win)
        banks[b, :hi - lo] = dft[lo:hi]
    mel = mel_lib.mel_weight_matrix(mel_bands, fft_bins,
                                    sample_rate, mel_min_hz, mel_max_hz)
    return banks, mel


# MXU precision for the DFT-bank and mel matmuls. HIGH (3-pass bf16
# operand-split) halves these matmuls' MXU cost vs HIGHEST (6-pass f32
# emulation) and is measured safe ON THE SCORE CONTRACT: worst on-chip
# |HIGH - cpu f32| score deviation 6.7e-06 — indistinguishable from
# HIGHEST's 6.9e-06 — including the near-silence worst case where
# log(mel+1e-3) amplifies absolute mel error (tools/
# frontend_precision_probe.py; classify 16.63 -> 16.08 ms per 960 s
# chunk). The round-2 finding that whole-graph HIGH deviates 7.8e-4 was
# the CONV stack's accumulation over 14 layers; the convs stay HIGHEST.
# DEFAULT (1-pass bf16) remains off the table here: raw bf16 operand
# rounding costs ~3 decimal digits and breaks the 1e-3 budget.
DFT_PRECISION = jax.lax.Precision.HIGH


@lru_cache(maxsize=64)
def _frame_indices(n_input: int, frame_length: int, hop: int):
    """(n_frames, frame_length) gather index matrix (a trace-time constant)."""
    n_frames = 1 + (n_input - frame_length) // hop
    starts = np.arange(n_frames, dtype=np.int32)[:, None] * hop
    return starts + np.arange(frame_length, dtype=np.int32)[None, :]


# --- the jitted graph --------------------------------------------------------

def log_mel_spectrogram(waveform: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """Padded (..., n) waveform -> (..., n_stft_frames, mel_bands) log-mel.

    Frame f spans hop rows f..f+n_banks-1 of the hop-strided signal, so the
    windowed DFT is the sum of n_banks shifted contiguous-reshape matmuls
    (see _dft_mel_constants) — gather-free and MXU-shaped.
    """
    waveform = waveform.astype(jnp.float32)
    hop, win = cfg.hop_samples, cfg.window_samples
    n = waveform.shape[-1]
    n_frames = 1 + (n - win) // hop

    # DFT_PRECISION (HIGH): a raw bf16 MXU pass would cost ~3 decimal digits
    # and break 1e-3 score parity; the 3-pass operand split holds the score
    # contract at 6.7e-06 on-chip (see the DFT_PRECISION comment above).
    banks, mel = _dft_mel_constants(cfg)
    n_banks = banks.shape[0]
    # shifted view b needs samples [b*hop, b*hop + n_frames*hop); the last
    # bank's zero rows let it run past the true window end, so pad the tail
    needed = (n_frames + n_banks - 1) * hop
    if needed > n:
        widths = [(0, 0)] * (waveform.ndim - 1) + [(0, needed - n)]
        waveform = jnp.pad(waveform, widths)
    batch = waveform.shape[:-1]
    spectrum = None
    for b in range(n_banks):
        view = jax.lax.slice_in_dim(waveform, b * hop,
                                    b * hop + n_frames * hop, axis=-1)
        rows = view.reshape(*batch, n_frames, hop)
        part = jnp.matmul(rows, jnp.asarray(banks[b]),
                          preferred_element_type=jnp.float32,
                          precision=DFT_PRECISION)
        spectrum = part if spectrum is None else spectrum + part
    re, im = jnp.split(spectrum, 2, axis=-1)         # (..., n_frames, 257) each
    magnitude = jnp.sqrt(re * re + im * im)
    mel_spec = jnp.matmul(magnitude, jnp.asarray(mel),
                          preferred_element_type=jnp.float32,
                          precision=DFT_PRECISION)
    return jnp.log(mel_spec + cfg.log_offset)


def patches_from_log_mel(log_mel: jnp.ndarray,
                         cfg: FrontendConfig) -> jnp.ndarray:
    """(..., n_stft_frames, mel_bands) -> (..., n_patches, patch_frames,
    mel_bands): overlapping patch framing, drop-remainder.

    At framehop 1.0 (hop == window, the analysis default) patches tile the
    spectrogram without overlap, so framing is a trim + reshape. Measured
    performance-neutral on v5e (XLA already lowers the contiguous gather
    well); kept because the reshape states the intent directly instead of
    relying on the compiler recognizing a 25 MB/chunk gather as a copy."""
    if cfg.patch_hop_frames == cfg.patch_frames:
        # no gather-index matrix needed (or lru-cached) on this path
        pf = cfg.patch_frames
        n_p = (log_mel.shape[-2] - pf) // cfg.patch_hop_frames + 1
        lead = log_mel.shape[:-2]
        trimmed = log_mel[..., :n_p * pf, :]
        return trimmed.reshape(*lead, n_p, pf, log_mel.shape[-1])
    idx = _frame_indices(log_mel.shape[-2], cfg.patch_frames,
                         cfg.patch_hop_frames)
    return log_mel[..., idx, :]


def log_mel_patches(waveform: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """1-D waveform -> (n_patches, patch_frames, mel_bands) log-mel patches.

    The input must already be padded (see :func:`pad_waveform`); only complete
    patches are emitted (drop-remainder, as in `features.py:63-79`).
    """
    return patches_from_log_mel(log_mel_spectrogram(waveform, cfg), cfg)

