"""Native decode-stage tests: exact PCM decode, provable seek accuracy,
downmix, resample, truncated files, and the reference mp3 fixture.
"""

import os
import shutil

import numpy as np
import pytest

from buzzdetect_tpu.audio import (build_track, get_duration, driver_map,
                                  UnsupportedFormat, NativeDriver)
from tests.audio_fixtures import (pcm_pattern, pattern_position, write_wav,
                                  make_tone)

REF_MP3 = '/root/reference/audio_in/testbuzz.mp3'


@pytest.fixture(scope='module')
def pattern_wav(tmp_path_factory):
    d = tmp_path_factory.mktemp('audio')
    path = str(d / 'pattern.wav')
    write_wav(path, pcm_pattern(0, 16000 * 10), 16000)
    return path


def test_wav_exact_decode(pattern_wav):
    t = build_track(pattern_wav, target_rate=16000)
    assert t.samplerate == 16000
    assert t.frames == 160000
    x = t.read(160000)
    np.testing.assert_array_equal(x, pcm_pattern(0, 160000))
    # EOF: further reads are empty
    assert len(t.read(100)) == 0
    t.close()


@pytest.mark.parametrize('target', [12345, 0, 159000, 80000, 79999, 1])
def test_wav_seek_sample_accurate(pattern_wav, target):
    t = build_track(pattern_wav, target_rate=16000)
    # scramble position first
    t.read(777)
    t.seek(target)
    assert t.tell() == target
    got = t.read(64)
    np.testing.assert_array_equal(got, pcm_pattern(target, 64))
    t.close()


def test_wav_random_seek_storm(pattern_wav):
    """The experiment the reference documents but doesn't ship: many random
    seeks, every landing position verified from sample values."""
    rng = np.random.default_rng(0)
    t = build_track(pattern_wav, target_rate=16000)
    for target in rng.integers(0, 159000, size=50):
        t.seek(int(target))
        got = t.read(2)
        assert pattern_position(got) % 65536 == int(target) % 65536
    t.close()


def test_stereo_downmix(tmp_path):
    x = make_tone(2.0, 16000)
    stereo = np.stack([x, x], axis=1)
    path = str(tmp_path / 'stereo.wav')
    write_wav(path, stereo, 16000)
    t = build_track(path, target_rate=16000)
    assert t.channels == 1          # output is downmixed
    assert t.source_channels == 2
    got = t.read(32000)
    # L==R so the mono mix equals the signal (16-bit quantization noise only)
    assert np.abs(got - x).max() < 2e-4
    t.close()


def test_resample_44k_to_16k(tmp_path):
    x = make_tone(2.0, 44100, freq=440.0)
    path = str(tmp_path / 'hi.wav')
    write_wav(path, x, 44100)
    t = build_track(path, target_rate=16000)
    assert t.samplerate == 16000
    got = t.read(64000)
    assert abs(len(got) - 32000) <= 32
    # 440 Hz tone survives resampling: dominant FFT bin near 440
    spec = np.abs(np.fft.rfft(got[:16384] * np.hanning(16384)))
    peak_hz = spec.argmax() * 16000 / 16384
    assert abs(peak_hz - 440) < 5
    t.close()


def test_native_rate_passthrough(tmp_path):
    x = make_tone(1.0, 22050)
    path = str(tmp_path / 'n.wav')
    write_wav(path, x, 22050)
    t = build_track(path, target_rate=0)   # 0 = native
    assert t.samplerate == 22050
    t.close()


def test_truncated_wav_decodes_available_payload(tmp_path, pattern_wav):
    """A byte-truncated WAV decodes whatever payload exists, without raising;
    the duration estimate reflects the actual payload."""
    path = str(tmp_path / 'trunc.wav')
    with open(pattern_wav, 'rb') as f:
        blob = f.read()
    with open(path, 'wb') as f:
        f.write(blob[:len(blob) // 2])
    t = build_track(path, target_rate=16000)
    got = t.read(200000)
    assert len(got) == pytest.approx(80000, abs=100)
    np.testing.assert_array_equal(got[:1000], pcm_pattern(0, 1000))
    t.close()


@pytest.mark.skipif(not os.path.exists(REF_MP3), reason='fixture not mounted')
def test_mp3_header_overestimate_gives_short_read():
    """The reference fixture's mp3 header promises ~6.55 s but the payload
    holds ~6.49 s: reading `frames` samples must return fewer — the exact
    signal the pipeline's bad-read handling keys on."""
    t = build_track(REF_MP3, target_rate=16000)
    got = t.read(t.frames)
    assert 0 < len(got) < t.frames
    t.close()


def test_unsupported_format(tmp_path):
    with pytest.raises(UnsupportedFormat):
        build_track(str(tmp_path / 'x.xyz'))


def test_driver_map_covers_reference_formats():
    # every format family the reference supports must be covered
    for ext in ['wav', 'flac', 'ogg', 'mp3', 'aiff', 'mp4', 'wma', 'mts']:
        assert ext in driver_map, ext


@pytest.mark.parametrize('codec,ext', [
    ('aac', 'm4a'),        # mp4 family: pts-exact w/ corrupt-first-frame preroll
    ('wmav2', 'wma'),      # asf family: pts drifts -> reopen-count strategy
    ('ac3', 'mts'),        # ac3: decoder never resyncs -> reopen-count
    ('libmp3lame', 'mp3'),
    ('flac', 'flac'),
    ('pcm_s16le', 'wav'),
    ('libopus', 'opus'),
    ('libvorbis', 'ogg'),
    ('flac', 'mka'),        # matroska container
    ('aac', 'mkv'),
    ('aac', 'aac'),         # raw ADTS: no edit list -> count-forward seek
    ('pcm_s16le', 'mov'),
])
def test_codec_seek_matches_linear_decode(tmp_path, codec, ext):
    """The invariant the reference drivers document from manual experiments
    (`src/stream/drivers/mp4.py:36-38`: '200 random backward-seek targets, 0
    real mismatches'): any seek+read must reproduce the fresh-open linear
    decode exactly (tiny float tolerance for AAC's nondeterministic MDCT)."""
    from buzzdetect_tpu.audio.ffi import encode_fixture
    path = str(tmp_path / f'fx.{ext}')
    encode_fixture(path, codec, 48000, 1, 4.0)

    t = build_track(path, target_rate=0)
    linear = t.read(48000 * 5)
    assert len(linear) > 3.5 * 48000

    rng = np.random.default_rng(7)
    # AAC/Opus MDCT reconstruction is float-nondeterministic at ~1e-4;
    # everything else must be bit-exact
    tol = 1e-4 if codec in ('aac', 'libopus') else 0.0
    for target in rng.integers(0, len(linear) - 4096, size=15):
        t.seek(int(target))
        got = t.read(4096)
        assert len(got) == 4096
        assert np.abs(got - linear[target:target + 4096]).max() <= tol, target
    t.close()


def test_file_vanishes_mid_analysis(tmp_path):
    """A backward seek on a reopen-strategy codec closes and reopens the file
    by path. If the file was deleted mid-analysis, the reopen fails and must
    surface as a DecodeError on seek and EOF (not a crash) on later reads."""
    from buzzdetect_tpu.audio.ffi import DecodeError, NativeStream, \
        encode_fixture
    path = str(tmp_path / 'gone.wma')
    encode_fixture(path, 'wmav2', 48000, 1, 2.0)
    t = NativeStream(path, target_rate=0)
    first = t.read(48000)
    assert len(first) == 48000
    os.unlink(path)
    with pytest.raises(DecodeError):
        t.seek(0)  # backward seek -> reopen-by-path -> fails
    # contexts are gone; reads must degrade to EOF, not segfault
    assert len(t.read(4096)) == 0
    assert len(t.read(4096)) == 0
    # further seeks (forward or backward) must error cleanly, not crash
    with pytest.raises(DecodeError):
        t.seek(96000)
    with pytest.raises(DecodeError):
        t.seek(100)
    assert len(t.read(4096)) == 0
    t.close()


def test_seek_recovers_when_file_reappears(tmp_path):
    """A seek after a failed reopen retries the open, so a transiently
    missing file (e.g. network mount hiccup) recovers instead of being
    permanently dead."""
    from buzzdetect_tpu.audio.ffi import DecodeError, NativeStream, \
        encode_fixture
    import shutil
    path = str(tmp_path / 'flaky.wma')
    encode_fixture(path, 'wmav2', 48000, 1, 2.0)
    backup = str(tmp_path / 'backup.wma')
    shutil.copyfile(path, backup)

    t = NativeStream(path, target_rate=0)
    linear = t.read(96000)
    os.unlink(path)
    with pytest.raises(DecodeError):
        t.seek(0)
    shutil.copyfile(backup, path)  # file comes back
    t.seek(48000)
    got = t.read(4096)
    assert len(got) == 4096
    assert np.array_equal(got, linear[48000:48000 + 4096])
    t.close()


def test_stereo_seek_after_downmix(tmp_path):
    from buzzdetect_tpu.audio.ffi import encode_fixture
    path = str(tmp_path / 'st.m4a')
    encode_fixture(path, 'aac', 44100, 2, 3.0)
    t = build_track(path, target_rate=16000)
    linear = t.read(16000 * 4)
    t.seek(16000)
    got = t.read(8000)
    assert np.abs(got - linear[16000:24000]).max() < 1e-3
    t.close()


@pytest.mark.skipif(not os.path.exists(REF_MP3), reason='fixture not mounted')
def test_reference_mp3_fixture():
    t = build_track(REF_MP3, target_rate=16000)
    assert t.samplerate == 16000
    assert t.codec.startswith('mp3')
    dur = get_duration(t)
    assert 5.0 < dur < 8.0
    x = t.read(16000)
    assert len(x) == 16000
    assert np.sqrt((x ** 2).mean()) > 1e-4   # real audio, not silence

    # seek-back consistency: re-reading a region matches the contiguous read
    t.seek(8000)
    y = t.read(8000)
    assert np.abs(y - x[8000:]).max() < 5e-3  # resampler warmup tolerance
    t.close()


@pytest.mark.skipif(not os.path.exists(REF_MP3), reason='fixture not mounted')
def test_mp3_copy_decodes_from_writable_dir(tmp_path):
    # guards against the decoder relying on anything but the file contents
    path = str(tmp_path / 'buzz.mp3')
    shutil.copy(REF_MP3, path)
    t = build_track(path, target_rate=16000)
    total = 0
    while True:
        b = t.read(65536)
        total += len(b)
        if len(b) < 65536:
            break
    # header overestimates (recorder died); actual payload is ~6.49 s
    assert total / 16000 == pytest.approx(6.49, abs=0.1)
    t.close()


def test_native_int16_wire_paths(tmp_path):
    """read_s16 and quantize_s16 are bit-exact with the numpy quantizer —
    the int16 wire format must not depend on which path produced it."""
    from buzzdetect_tpu.audio.ffi import NativeStream, encode_fixture, \
        quantize_s16

    def numpy_quant(x):
        return (np.clip(x, -1.0, 1.0) * 32767.0).round().astype(np.int16)

    # standalone quantizer: exact on edge cases (clipping, halves, zeros)
    x = (np.random.default_rng(7).standard_normal(100_000) * 0.6
         ).astype(np.float32)
    x[:8] = [2.0, -2.0, 1.0, -1.0, 0.5, -0.5, 0.0, 1e-9]
    got = quantize_s16(x)
    assert got.dtype == np.int16
    assert np.array_equal(got, numpy_quant(x))

    # streaming path: decode-to-int16 equals decode-to-float + quantize
    path = str(tmp_path / 'w.flac')
    encode_fixture(path, 'flac', 16000, 1, 3.0)
    with NativeStream(path, target_rate=0) as a:
        f = a.read(40000)
    with NativeStream(path, target_rate=0) as b:
        q = b.read(40000, dtype=np.int16)
    assert q.dtype == np.int16
    assert np.array_equal(q, numpy_quant(f))

    # utils.quantize_int16 routes through the native kernel transparently
    from buzzdetect_tpu.utils import quantize_int16
    assert np.array_equal(quantize_int16(x), numpy_quant(x))


def test_mulaw_wire_format(tmp_path):
    """mu-law encode: native == numpy fallback (±1 LSB for libm halves);
    round-trip error bounded by the companding step size."""
    from buzzdetect_tpu.audio.ffi import NativeStream, encode_fixture, \
        mulaw_s8
    from buzzdetect_tpu.utils import encode_mulaw, _LN256

    rng = np.random.default_rng(3)
    x = np.concatenate([
        rng.standard_normal(50_000) * 0.3,
        rng.standard_normal(10_000) * 1e-3,       # quiet passage
        np.array([2.0, -2.0, 1.0, -1.0, 0.0, 1e-9, -1e-9]),
    ]).astype(np.float32)

    native = mulaw_s8(x)
    assert native.dtype == np.int8
    fallback = (np.sign(np.clip(x, -1, 1)) * np.round(
        np.log1p(255.0 * np.abs(np.clip(x, -1, 1))) * (127.0 / _LN256))
    ).astype(np.int8)
    assert np.abs(native.astype(np.int16)
                  - fallback.astype(np.int16)).max() <= 1
    assert np.array_equal(encode_mulaw(x), native)  # utils routes to native

    # round-trip through the device-side expansion law
    y = native.astype(np.float32) / 127.0
    rec = np.sign(y) * np.expm1(np.abs(y) * _LN256) / 255.0
    clipped = np.clip(x, -1.0, 1.0)
    # step in companded space is 1/127; |dx/dy| = ln256*(|x| + 1/255),
    # evaluated at the interval endpoint where the derivative is largest
    # (5% slack for curvature within the step)
    bound = _LN256 * (np.maximum(np.abs(clipped), np.abs(rec))
                      + 1.0 / 255.0) / (2 * 127.0) * 1.05 + 1e-6
    assert np.all(np.abs(rec - clipped) <= bound)
    # quiet samples keep ~constant relative precision (the point of mu-law)
    quiet = np.abs(clipped) < 1e-2
    nz = quiet & (np.abs(clipped) > 1e-3)
    assert np.median(np.abs(rec[nz] - clipped[nz]) / np.abs(clipped[nz])) \
        < 0.10

    # streaming path: decode-to-mulaw equals decode-to-float + encode
    path = str(tmp_path / 'm.flac')
    encode_fixture(path, 'flac', 16000, 1, 2.0)
    with NativeStream(path, target_rate=0) as a:
        f = a.read(30000)
    with NativeStream(path, target_rate=0) as b:
        q = b.read_mulaw(30000)
    assert np.abs(q.astype(np.int16)
                  - mulaw_s8(f).astype(np.int16)).max() <= 1


def test_seek_after_recovery_ignores_stale_position(tmp_path):
    """After a failed reopen, the recovery seek must not trust the dead
    stream's out_pos/fifo: seeking to exactly the pre-failure position used
    to hit the 'already buffered' fast path and silently serve samples from
    file position 0 labeled as the target."""
    from buzzdetect_tpu.audio.ffi import DecodeError, NativeStream, \
        encode_fixture
    import shutil
    path = str(tmp_path / 'f.wma')
    encode_fixture(path, 'wmav2', 48000, 1, 3.0)
    backup = str(tmp_path / 'b.wma')
    shutil.copyfile(path, backup)

    t = NativeStream(path, target_rate=0)
    linear = t.read(96000)           # out_pos now 96000
    os.unlink(path)
    with pytest.raises(DecodeError):
        t.seek(10)                   # reopen fails, contexts dead
    shutil.copyfile(backup, path)    # file comes back
    t.seek(96000)                    # == the stale out_pos
    got = t.read(4096)
    # continuation past the original read must match a fresh linear decode
    t2 = NativeStream(path, target_rate=0)
    t2.read(96000)
    expect = t2.read(4096)
    t2.close()
    assert np.array_equal(got, expect)
    assert not np.array_equal(got, linear[:4096])  # not sample-0 audio
    t.close()


def test_mulaw_codebook_self_consistent():
    """Exhaustive over all 255 codes: the device expansion is the exact
    inverse of the host encoder (encode(expand(q)) == q), so wire round
    trips are stable — re-encoding decoded audio cannot drift."""
    from buzzdetect_tpu.audio.ffi import mulaw_s8
    from buzzdetect_tpu.utils import _LN256
    q = np.arange(-127, 128, dtype=np.int8)
    y = q.astype(np.float32) / 127.0
    x = np.sign(y) * np.expm1(np.abs(y) * _LN256) / 255.0  # device law
    assert np.abs(x).max() <= 1.0 + 1e-6
    assert np.array_equal(mulaw_s8(x.astype(np.float32)), q)
    # the jit graph applies the same law
    import jax.numpy as jnp
    from buzzdetect_tpu.models.classifier import _to_float
    dev = np.asarray(_to_float(jnp.asarray(q)))
    np.testing.assert_allclose(dev, x, atol=1e-6)


def test_vbr_mp3_seek_matches_linear_decode(tmp_path):
    """True-VBR MP3 (lame QSCALE mode, complexity-modulated signal): the
    mp3 demuxer's post-seek timestamps must still land seeks exactly. VBR
    frame sizes defeat naive byte interpolation, so this guards the
    SEEK_PTS classification of MP3 against demuxer regressions (measured:
    modern FFmpeg + the Xing/LAME header keep it sample-exact)."""
    from buzzdetect_tpu.audio.ffi import encode_fixture
    path = str(tmp_path / 'vbr.mp3')
    encode_fixture(path, 'libmp3lame', 48000, 1, 20.0, vbr=True)
    # sanity: the encode really was VBR (way below the 128k CBR default)
    kbps = os.path.getsize(path) * 8 / 20.0 / 1000
    assert kbps < 100, f'fixture unexpectedly CBR-sized ({kbps:.0f} kbps)'

    t = build_track(path, target_rate=0)
    linear = t.read(48000 * 21)
    rng = np.random.default_rng(11)
    for target in rng.integers(0, len(linear) - 4096, size=15):
        t.seek(int(target))
        got = t.read(4096)
        assert np.array_equal(got, linear[target:target + 4096]), target
    t.close()


def test_resampled_seek_near_eof_applies_warmup_drop(tmp_path):
    """Seeking close to EOF of a rate-converted stream: the resampler's
    warmup output can arrive via the EOF tail flush, which must still apply
    the pending post-seek drop — otherwise pre-target samples are served as
    target-position audio (silently shifted final-chunk results)."""
    from buzzdetect_tpu.audio.ffi import encode_fixture
    path = str(tmp_path / 'fx.flac')
    encode_fixture(path, 'flac', 48000, 1, 3.0)

    t = build_track(path, target_rate=16000)
    linear = t.read(16000 * 4)
    n = len(linear)
    assert n >= int(2.9 * 16000)
    # targets inside the final ~150 output samples, where EOF interrupts
    # the warmup feed and the tail flush carries the remainder
    for back in (5, 17, 40, 90, 150):
        target = n - back
        t.seek(target)
        got = t.read(back + 10)
        ref = linear[target:]
        assert len(got) == len(ref), (back, len(got), len(ref))
        assert np.array_equal(got, ref), f'eof-seek -{back} shifted'
    t.close()


def test_closed_stream_raises_not_crashes(tmp_path):
    """read/seek/tell on a closed stream must raise DecodeError — passing
    the NULL handle into the C stage would segfault the whole process."""
    from buzzdetect_tpu.audio.ffi import encode_fixture, NativeStream, \
        DecodeError
    path = str(tmp_path / 'fx.wav')
    encode_fixture(path, 'pcm_s16le', 16000, 1, 1.0)
    t = NativeStream(path, target_rate=0)
    t.read(100)
    t.close()
    for call in (lambda: t.read(10), lambda: t.read_s16(10),
                 lambda: t.read_mulaw(10), lambda: t.seek(0),
                 lambda: t.tell()):
        with pytest.raises(DecodeError, match='closed'):
            call()
    t.close()  # double-close stays a no-op


def test_native_driver_read_honors_dtype(tmp_path):
    """The AudioDriver contract is read(n, dtype); the native driver must
    forward it (int16 rides the fused native path)."""
    from buzzdetect_tpu.audio.ffi import encode_fixture
    from buzzdetect_tpu.audio import NativeDriver
    path = str(tmp_path / 'fx.wav')
    encode_fixture(path, 'pcm_s16le', 16000, 1, 1.0)
    d = NativeDriver(path, target_rate=16000)
    f32 = d.read(1000)
    assert f32.dtype == np.float32
    d.seek(0)
    i16 = d.read(1000, dtype=np.int16)
    assert i16.dtype == np.int16
    np.testing.assert_allclose(i16.astype(np.float32) / 32767.0, f32,
                               atol=1.0 / 32000)
    d.close()


def test_midstream_channel_layout_switch(tmp_path):
    """A stream whose channel layout changes mid-file must keep decoding,
    not crash: the resampler is reconfigured per frame when the decoded
    frame's layout/format/rate differ from the open-time parameters.

    Broadcast codecs do this legitimately (an MTS capture switching
    2.0 -> 5.1) and corrupt streams do it accidentally — the pre-fix
    decoder passed the new frame into an swr configured for the old
    layout and segfaulted on the missing channel planes (found by
    tools/fuzz_decode.py, reproduced deterministically here: this exact
    fixture crashes the previous library build with SIGSEGV)."""
    from buzzdetect_tpu.audio.ffi import encode_fixture, NativeStream
    mono = str(tmp_path / 'mono.ac3')
    stereo = str(tmp_path / 'stereo.ac3')
    encode_fixture(mono, 'ac3', 48000, 1, 1.0)
    encode_fixture(stereo, 'ac3', 48000, 2, 1.0)
    switched = str(tmp_path / 'switch.ac3')
    with open(switched, 'wb') as f:
        f.write(open(mono, 'rb').read() + open(stereo, 'rb').read())

    t = NativeStream(switched, target_rate=16000)
    total = 0
    while True:
        got = t.read(65536)
        assert np.all(np.isfinite(got))
        total += len(got)
        if len(got) < 65536:
            break
    # both halves decode (~2 s of audio; AC3 frame padding makes it inexact)
    assert total >= int(1.9 * 16000)
    t.close()


@pytest.mark.parametrize('src_rate,channels', [
    (8000, 1),     # telephone-band recorder: 2x upsample
    (192000, 2),   # studio capture: 12x downsample
    (22050, 6),    # many-channel array mic: 6-way equal downmix
])
def test_extreme_but_valid_formats(tmp_path, src_rate, channels):
    """Recorder media spans odd-but-legal formats; the native stage must
    resample/downmix them to the model rate with an accurate duration and
    amplitude-preserving equal-weight downmix (a tone identical on all
    channels must survive at ~its amplitude; reference contract is
    np.mean over channels, `src/stream/worker.py:117`)."""
    from buzzdetect_tpu.audio.ffi import NativeStream
    import wave
    path = str(tmp_path / 'fx.wav')
    tone = (0.5 * np.sin(2 * np.pi * 440.0 / src_rate *
                         np.arange(src_rate * 2))).astype(np.float32)
    pcm = (np.repeat(tone[:, None], channels, axis=1) *
           32767).astype('<i2')
    with wave.open(path, 'wb') as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(src_rate)
        w.writeframes(pcm.tobytes())

    t = NativeStream(path, target_rate=16000)
    assert t.samplerate == 16000
    assert abs(t.frames - 32000) <= 16  # 2 s at the model rate
    got = t.read(40000)
    t.close()
    assert abs(len(got) - 32000) <= 64
    assert np.all(np.isfinite(got))
    # equal-weight downmix of identical channels preserves amplitude
    mid = got[8000:24000]
    assert 0.4 <= np.abs(mid).max() <= 0.55
    # and it's still a 440 Hz tone after resampling (zero-crossing count)
    crossings = np.sum(np.abs(np.diff(np.signbit(mid).astype(np.int8))))
    assert abs(crossings - 880) <= 20


def test_midstream_sample_rate_switch_truncates_honestly(tmp_path):
    """Unlike a layout change (reconfigured and decoded through), a
    mid-stream SAMPLE-RATE change cannot be converted without corrupting
    every position downstream (native positions are denominated in the
    open-time rate) — rate-changed frames are dropped, so decode ends at
    the switch with a short read (the pipeline's bad-read path) instead of
    serving mis-timestamped audio."""
    from buzzdetect_tpu.audio.ffi import encode_fixture, NativeStream
    a = str(tmp_path / 'a.ac3')
    b = str(tmp_path / 'b.ac3')
    encode_fixture(a, 'ac3', 48000, 1, 1.0)
    encode_fixture(b, 'ac3', 44100, 1, 1.0)
    switched = str(tmp_path / 'switch_rate.ac3')
    with open(switched, 'wb') as f:
        f.write(open(a, 'rb').read() + open(b, 'rb').read())

    t = NativeStream(switched, target_rate=16000)
    total = 0
    while True:
        got = t.read(65536)
        total += len(got)
        if len(got) < 65536:
            break
    t.close()
    # only the first (rate-matching) second decodes; the 44.1 kHz tail is
    # dropped, not mislabeled
    assert int(0.9 * 16000) <= total <= int(1.2 * 16000)


def test_concurrent_decode_sample_accuracy(tmp_path):
    """The decode stage's selling point is GIL-free parallel decode
    (many streamer threads sharing one .so). Hammer it: concurrent
    streams over distinct files AND over the same file, each doing a
    seek storm with every landing verified from sample values — any
    hidden shared state in the native layer would cross-contaminate
    positions or buffers."""
    import threading
    paths = []
    for i in range(3):
        p = str(tmp_path / f'p{i}.wav')
        write_wav(p, pcm_pattern(i * 1000000, 16000 * 6), 16000)
        paths.append((p, i * 1000000))

    errors = []

    def storm(path, base, seed):
        try:
            rng = np.random.default_rng(seed)
            t = build_track(path, target_rate=16000)
            for target in rng.integers(0, 16000 * 6 - 64, size=40):
                t.seek(int(target))
                got = t.read(2)
                want = (base + int(target)) % 65536
                assert pattern_position(got) % 65536 == want, \
                    f'{path}@{target}'
            t.close()
        except Exception as e:
            errors.append(e)

    threads = []
    for k, (p, base) in enumerate(paths * 2):  # same file opened twice
        threads.append(threading.Thread(target=storm, args=(p, base, k)))
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errors == []
