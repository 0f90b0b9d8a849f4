"""On-device resampling integration: native-rate wire samples resampled to
the model rate inside the jit graph (analyze(resample_on_device=True)).

Replaces the host resample pass entirely (reference hotspot:
`src/stream/worker.py:128` librosa.resample per chunk; decode documented as
the GPU-era ceiling at `docs/source/tuning.rst:57-62`).
"""

import os

import numpy as np
import pytest

from buzzdetect_tpu import config as cfg
from buzzdetect_tpu.models import yamnet as yamnet_lib
from buzzdetect_tpu.models.classifier import ChunkClassifier
from buzzdetect_tpu.models.convert import build_model_bundle
from buzzdetect_tpu.models.heads import init_head
from buzzdetect_tpu.ops.resample import resample
from tests.audio_fixtures import make_tone, write_wav

RNG = np.random.default_rng(11)


@pytest.fixture(scope='module')
def clf():
    raw = yamnet_lib.init_raw_params(seed=5)
    arrays = {f'yamnet_raw/{k}': v for k, v in raw.items()}
    arrays.update(init_head(yamnet_lib.N_EMBEDDINGS, 4, seed=5))
    return ChunkClassifier(arrays, framehop_prop=1.0)


@pytest.mark.parametrize('native', [44100, 48000, 22050, 8000])
def test_predict_input_rate_matches_host_resample(clf, native):
    """Scores from native-rate input resampled in-graph must match scores
    from the SAME resampler applied on the host (isolates the graph wiring
    from filter-design differences)."""
    n = int(3.0 * native)
    wav_native = (RNG.standard_normal(n) * 0.1).astype(np.float32)
    scores_device = clf.predict(wav_native, input_rate=native)
    wav_model = np.asarray(resample(wav_native, native, 16000))
    scores_host = clf.predict(wav_model)
    assert scores_device.shape == scores_host.shape
    np.testing.assert_allclose(scores_device, scores_host, atol=5e-3)


def test_predict_batch_input_rate(clf):
    native = 32000
    wavs = [(RNG.standard_normal(int(s * native)) * 0.1).astype(np.float32)
            for s in (2.0, 3.0)]
    out, n_valids = clf.predict_async_batch(wavs, input_rate=native)
    out = np.asarray(out)
    for i, w in enumerate(wavs):
        single = clf.predict(w, input_rate=native)
        np.testing.assert_allclose(out[i, :n_valids[i]], single, atol=5e-3)


def test_input_rate_at_model_rate_is_identity_path(clf):
    wav = (RNG.standard_normal(2 * 16000) * 0.1).astype(np.float32)
    a = clf.predict(wav)
    b = clf.predict(wav, input_rate=16000)
    np.testing.assert_array_equal(a, b)


# --- end-to-end pipeline -----------------------------------------------------

@pytest.fixture(scope='module')
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp('devresample')
    dir_models = root / 'models'
    build_model_bundle(str(dir_models / 'testmodel'),
                       classes=['a', 'b', 'ins_buzz'], seed=3)
    dir_audio = root / 'audio_in'
    dir_audio.mkdir()
    write_wav(dir_audio / 'tone44k.wav', make_tone(4.0, 44100, 440), 44100)
    write_wav(dir_audio / 'noise48k.wav',
              (np.random.default_rng(2).standard_normal(3 * 48000) * 0.05
               ).astype(np.float32), 48000)
    write_wav(dir_audio / 'native16k.wav', make_tone(3.0, 16000, 220), 16000)
    return {'models': str(dir_models), 'audio': str(dir_audio), 'root': root}


def _read_scores(path):
    import csv
    with open(path) as f:
        rows = list(csv.reader(f))
    return rows[0], np.asarray(rows[1:], np.float64)


def test_analyze_resample_on_device_matches_host_path(env, monkeypatch,
                                                      tmp_path):
    from buzzdetect_tpu.analysis import analyze
    monkeypatch.setattr(cfg, 'DIR_MODELS', env['models'])

    out_host = str(tmp_path / 'host')
    out_dev = str(tmp_path / 'dev')
    common = dict(modelname='testmodel', dir_audio=env['audio'],
                  verbosity_print='ERROR', transfer_dtype='float32')
    analyze(dir_out=out_host, **common)
    analyze(dir_out=out_dev, resample_on_device=True, **common)

    for name in ('tone44k', 'noise48k', 'native16k'):
        hdr_h, host = _read_scores(
            os.path.join(out_host, f'{name}_buzzdetect.csv'))
        hdr_d, dev = _read_scores(
            os.path.join(out_dev, f'{name}_buzzdetect.csv'))
        assert hdr_h == hdr_d
        assert host.shape == dev.shape, name
        np.testing.assert_allclose(dev[:, 0], host[:, 0], err_msg=name)
        # host path resamples with libswresample, device path with the
        # polyphase kernel — different filter designs, so allow real but
        # small score movement; a 16 kHz file takes the identity path
        tol = 0.011 if name == 'native16k' else 0.35
        assert np.abs(dev[:, 1:] - host[:, 1:]).max() <= tol, name


def test_analyze_rejects_unsupported_model(env, monkeypatch, tmp_path):
    """Plugin models receive model-rate samples; resample_on_device must
    fail fast instead of silently feeding them native-rate audio."""
    from buzzdetect_tpu.analysis import Analyzer
    monkeypatch.setattr(cfg, 'DIR_MODELS', env['models'])

    import buzzdetect_tpu.models.registry as registry
    real_load = registry.load_model

    def load_no_resample(*a, **k):
        m = real_load(*a, **k)
        m.supports_device_resample = False
        return m

    monkeypatch.setattr('buzzdetect_tpu.analysis.load_model',
                        load_no_resample)
    with pytest.raises(ValueError, match='resample_on_device'):
        Analyzer(modelname='testmodel', dir_audio=env['audio'],
                 dir_out=str(tmp_path / 'out'), resample_on_device=True)
