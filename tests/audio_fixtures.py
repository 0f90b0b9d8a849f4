"""Synthetic audio fixtures for driver tests.

The deterministic PCM pattern makes seek accuracy *provable*: sample n of the
generated file has value pattern(n) exactly (int16-representable), so after
any seek the decoded values identify the true position. This is the
verification harness the reference only describes in driver docstrings
(`src/stream/drivers/mp4.py:36-38`) but never shipped.
"""

import struct
import wave

import numpy as np


def pcm_pattern(n0: int, n: int) -> np.ndarray:
    """Deterministic int16-exact float pattern for samples [n0, n0+n)."""
    idx = np.arange(n0, n0 + n, dtype=np.int64)
    ints = ((idx * 31 + 7) % 65536) - 32768
    return (ints / 32768.0).astype(np.float32)


def pattern_position(values: np.ndarray) -> int:
    """Recover the sample index of values[0] produced by pcm_pattern."""
    v0 = int(round(float(values[0]) * 32768)) + 32768
    v1 = int(round(float(values[1]) * 32768)) + 32768
    for n in range(65536):
        if (n * 31 + 7) % 65536 == v0 and ((n + 1) * 31 + 7) % 65536 == v1:
            return n
    raise ValueError('pattern not recognized')


def write_wav(path, data: np.ndarray, samplerate: int):
    """Write float32 [-1,1) data as 16-bit PCM WAV (mono or (n, ch))."""
    data = np.asarray(data)
    if data.ndim == 1:
        data = data[:, None]
    ints = np.clip(np.round(data * 32768), -32768, 32767).astype('<i2')
    with wave.open(str(path), 'wb') as w:
        w.setnchannels(data.shape[1])
        w.setsampwidth(2)
        w.setframerate(samplerate)
        w.writeframes(ints.tobytes())


def write_wav_float32(path, data: np.ndarray, samplerate: int):
    """Write a WAVE_FORMAT_IEEE_FLOAT mono WAV (bit-exact float32 samples)."""
    data = np.asarray(data, np.float32)
    payload = data.tobytes()
    hdr = b'RIFF' + struct.pack('<I', 4 + 26 + 12 + len(payload)) + b'WAVE'
    fmt = struct.pack('<4sIHHIIHH', b'fmt ', 18, 3, 1, samplerate,
                      samplerate * 4, 4, 32) + struct.pack('<H', 0)[:0]
    # fmt chunk size 18 requires cbSize field
    fmt = struct.pack('<4sIHHIIHHH', b'fmt ', 18, 3, 1, samplerate,
                      samplerate * 4, 4, 32, 0)
    fact = struct.pack('<4sII', b'fact', 4, len(data))
    datahdr = struct.pack('<4sI', b'data', len(payload))
    with open(path, 'wb') as f:
        f.write(hdr + fmt + fact + datahdr + payload)


def make_tone(seconds: float, samplerate: int, freq: float = 220.0,
              harmonics: int = 3) -> np.ndarray:
    t = np.arange(int(seconds * samplerate)) / samplerate
    x = sum((0.2 / k) * np.sin(2 * np.pi * freq * k * t)
            for k in range(1, harmonics + 1))
    return x.astype(np.float32)
