"""Pallas fused frontend: parity with the XLA frontend (interpreter mode on
the CPU test mesh; compiled mode on real TPU via bench)."""

import numpy as np
import pytest

import jax
from jax.experimental.pallas import tpu as pltpu

from buzzdetect_tpu.ops.frontend import (FrontendConfig, pad_waveform,
                                         log_mel_spectrogram)

RNG = np.random.default_rng(5)


@pytest.mark.parametrize('seconds', [1.0, 4.8, 10.0])
def test_pallas_matches_xla_frontend(seconds):
    from buzzdetect_tpu.ops.pallas_frontend import log_mel_spectrogram_pallas
    cfg = FrontendConfig().with_framehop(1.0)
    wav = (RNG.standard_normal(int(seconds * 16000)) * 0.1).astype(np.float32)
    padded = pad_waveform(wav, cfg)

    xla = np.asarray(log_mel_spectrogram(padded, cfg))
    with pltpu.force_tpu_interpret_mode():
        pallas = np.asarray(log_mel_spectrogram_pallas(padded, cfg))

    assert pallas.shape == xla.shape
    np.testing.assert_allclose(pallas, xla, atol=2e-4)


def test_classifier_pallas_frontend_matches_xla():
    """ChunkClassifier(frontend='pallas') produces the same scores as the
    default XLA frontend (interpreter mode on CPU)."""
    from buzzdetect_tpu.models import yamnet as yam
    from buzzdetect_tpu.models.classifier import ChunkClassifier
    from buzzdetect_tpu.models.heads import init_head

    folded = yam.fold_batchnorm(yam.init_raw_params(seed=6))
    arrays = {f'yamnet/{k}': v for k, v in folded.items()}
    arrays.update(init_head(1024, 3, seed=6))

    wav = (RNG.standard_normal(int(3.0 * 16000)) * 0.1).astype(np.float32)
    xla_out = ChunkClassifier(arrays, framehop_prop=1.0).predict(wav)
    with pltpu.force_tpu_interpret_mode():
        pl_out = ChunkClassifier(arrays, framehop_prop=1.0,
                                 frontend='pallas').predict(wav)
    np.testing.assert_allclose(pl_out, xla_out, atol=1e-3)


def _tiny_arrays(seed=6, n_classes=3):
    from buzzdetect_tpu.models import yamnet as yam
    from buzzdetect_tpu.models.heads import init_head
    folded = yam.fold_batchnorm(yam.init_raw_params(seed=seed))
    arrays = {f'yamnet/{k}': v for k, v in folded.items()}
    arrays.update(init_head(1024, n_classes, seed=seed))
    return arrays


def test_frontend_auto_resolves_by_backend():
    """'auto' (the default) picks pallas on TPU, xla elsewhere; this CPU
    suite must see xla so tests never depend on the Mosaic toolchain."""
    from buzzdetect_tpu.models.classifier import ChunkClassifier
    clf = ChunkClassifier(_tiny_arrays())
    expected = 'pallas' if jax.default_backend() == 'tpu' else 'xla'
    assert clf.frontend == expected
    assert clf._frontend_auto

    with pytest.raises(ValueError):
        ChunkClassifier(_tiny_arrays(), frontend='tensorflow')


def test_frontend_auto_falls_back_when_pallas_fails():
    """If the auto-selected pallas kernel cannot compile (Mosaic fault),
    the classifier degrades to the XLA frontend once and keeps working.
    On CPU a non-interpreted pallas compile fails naturally, which is
    exactly the failure mode being exercised."""
    from buzzdetect_tpu.models.classifier import ChunkClassifier
    arrays = _tiny_arrays()
    wav = (RNG.standard_normal(int(2.0 * 16000)) * 0.1).astype(np.float32)
    want = ChunkClassifier(arrays).predict(wav)

    clf = ChunkClassifier(arrays)
    clf.frontend = 'pallas'       # simulate auto-resolution to pallas
    clf._frontend_auto = True
    got = clf.predict(wav)
    assert clf.frontend == 'xla'  # one-way fallback happened
    np.testing.assert_allclose(got, want, rtol=0, atol=0)

    # an EXPLICIT pallas request must not silently degrade
    strict = ChunkClassifier(arrays, frontend='pallas')
    assert not strict._frontend_auto
    with pytest.raises(Exception):
        strict.predict(wav)


def test_frontend_no_fallback_once_proven():
    """After the pallas kernel has dispatched successfully, later errors
    (device OOM, malformed plugin input, transient runtime faults) must
    surface to the caller — not silently demote the run to the ~20x-slower
    XLA frontend under a misleading 'failed to compile' warning."""
    from buzzdetect_tpu.models.classifier import ChunkClassifier
    arrays = _tiny_arrays()
    clf = ChunkClassifier(arrays)
    clf.frontend = 'pallas'
    clf._frontend_auto = True
    clf._pallas_proven = True  # as if the kernel had been running for hours
    wav = (RNG.standard_normal(int(2.0 * 16000)) * 0.1).astype(np.float32)
    with pytest.raises(Exception):
        clf.predict(wav)        # CPU pallas compile failure stands in for
    assert clf.frontend == 'pallas'  # any post-proof fault: no silent demote
