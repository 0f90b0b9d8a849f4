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


def test_classifier_pallas_frontend_batch_path():
    """frontend='pallas' must also run pallas on the BATCH dispatch path
    (predict_async_batch): it used to silently fall back to the XLA
    frontend there, contrary to _classify's no-silent-substitution
    contract. Verified by score parity in interpreter mode AND by the
    off-TPU failure mode (a pallas kernel can't compile on plain CPU, so
    a silent XLA substitution would make the second half of this test
    pass where it must raise)."""
    from buzzdetect_tpu.models.classifier import ChunkClassifier

    arrays = _tiny_arrays()
    wavs = [(RNG.standard_normal(int(s * 16000)) * 0.1).astype(np.float32)
            for s in (2.0, 3.0)]
    xla_clf = ChunkClassifier(arrays, framehop_prop=1.0)
    xla_out, xla_valid = xla_clf.predict_async_batch(wavs)
    pl_clf = ChunkClassifier(arrays, framehop_prop=1.0, frontend='pallas')
    with pltpu.force_tpu_interpret_mode():
        pl_out, pl_valid = pl_clf.predict_async_batch(wavs)
    assert pl_valid == xla_valid
    np.testing.assert_allclose(np.asarray(pl_out), np.asarray(xla_out),
                               atol=1e-3)

    # outside interpreter mode the explicit choice fails loudly on CPU
    strict = ChunkClassifier(arrays, frontend='pallas')
    with pytest.raises(Exception):
        strict.predict_async_batch(wavs)


def _tiny_arrays(seed=6, n_classes=3):
    from buzzdetect_tpu.models import yamnet as yam
    from buzzdetect_tpu.models.heads import init_head
    folded = yam.fold_batchnorm(yam.init_raw_params(seed=seed))
    arrays = {f'yamnet/{k}': v for k, v in folded.items()}
    arrays.update(init_head(1024, n_classes, seed=seed))
    return arrays


def test_frontend_auto_resolves_to_banked_xla():
    """'auto' (the default) resolves to the hop-banked XLA frontend on every
    backend — it out-measures the fused pallas kernel on a real v5e (13.6 vs
    16.9 ms per 960 s chunk f32; 6.0 vs 9.6 ms bf16, dispatch-slope method).
    'auto' stays the default name so resolution can be re-tuned per backend
    without touching callers."""
    from buzzdetect_tpu.models.classifier import ChunkClassifier
    clf = ChunkClassifier(_tiny_arrays())
    assert clf.frontend == 'xla'
    assert clf._frontend_auto

    with pytest.raises(ValueError):
        ChunkClassifier(_tiny_arrays(), frontend='tensorflow')


def test_frontend_explicit_pallas_fails_loudly_off_tpu():
    """An EXPLICIT pallas request must never silently substitute another
    frontend: on CPU (no Mosaic compiler) it raises."""
    from buzzdetect_tpu.models.classifier import ChunkClassifier
    wav = (RNG.standard_normal(int(2.0 * 16000)) * 0.1).astype(np.float32)
    strict = ChunkClassifier(_tiny_arrays(), frontend='pallas')
    assert not strict._frontend_auto
    with pytest.raises(Exception):
        strict.predict(wav)
    assert strict.frontend == 'pallas'
