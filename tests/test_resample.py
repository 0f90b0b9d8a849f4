"""Device-side polyphase resampler vs scipy.signal.resample_poly."""

import numpy as np
import pytest

from buzzdetect_tpu.ops.resample import resample

scipy_signal = pytest.importorskip('scipy.signal')

RNG = np.random.default_rng(0)


@pytest.mark.parametrize('orig,target', [
    (48000, 16000), (44100, 16000), (32000, 16000), (22050, 16000),
    (8000, 16000),
])
def test_matches_scipy_polyphase(orig, target):
    t = np.arange(int(0.5 * orig)) / orig
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.1 * RNG.standard_normal(len(t))).astype(np.float32)

    ours = np.asarray(resample(x, orig, target))
    n_expected = -(-len(x) * target // orig)
    assert len(ours) == n_expected

    from math import gcd
    g = gcd(orig, target)
    theirs = scipy_signal.resample_poly(x, target // g, orig // g)
    # compare away from the edges (different edge-padding conventions)
    m = min(len(ours), len(theirs))
    a, b = ours[100:m - 100], theirs[100:m - 100]
    # signals are O(0.5); agreement to ~1e-2 abs = same filter family
    assert np.abs(a - b).max() < 2e-2
    # and near-perfect correlation
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.9995


def test_tone_preserved_through_resample():
    orig, target = 44100, 16000
    t = np.arange(orig) / orig
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = np.asarray(resample(x, orig, target))
    spec = np.abs(np.fft.rfft(y[:8192] * np.hanning(8192)))
    peak_hz = spec.argmax() * target / 8192
    assert abs(peak_hz - 1000) < 5


def test_identity_when_rates_equal():
    x = RNG.standard_normal(1000).astype(np.float32)
    y = resample(x, 16000, 16000)
    assert y.dtype == np.float32
    np.testing.assert_array_equal(np.asarray(y), x)
    # the dtype contract must not depend on the rate pair: every path
    # returns float32, including the passthrough
    yi = resample(x.astype(np.int16), 16000, 16000)
    assert yi.dtype == np.float32


def test_batched():
    x = RNG.standard_normal((3, 32000)).astype(np.float32)
    y = np.asarray(resample(x, 32000, 16000))
    single = np.asarray(resample(x[1], 32000, 16000))
    assert y.shape == (3, 16000)
    np.testing.assert_allclose(y[1], single, atol=1e-6)
