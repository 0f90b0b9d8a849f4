"""Audio dispatch: extension -> driver map, track construction, duration.

Parity with reference `src/stream/audio.py:22-65` (driver_map / build_track /
get_duration / UnsupportedFormat), with the native libav stage replacing both
libsndfile and the PyAV driver zoo. Per-extension driver modules under
``drivers/`` may override entries exactly like the reference's plugin dir;
the native stage handles everything else.
"""

import importlib.util
import os

import numpy as np

from buzzdetect_tpu.audio.driver import AudioDriver
from buzzdetect_tpu.audio.ffi import NativeStream, DecodeError  # noqa: F401 (DecodeError re-exported)


class UnsupportedFormat(ValueError):
    pass


# Formats the native libav stage demuxes+decodes. Mirrors the union of the
# reference's libsndfile formats and its PyAV drivers (mp4/wma/mts), plus the
# containers libav gives us for free.
NATIVE_EXTENSIONS = [
    'wav', 'wave', 'flac', 'ogg', 'oga', 'opus', 'mp3', 'mp2',
    'aiff', 'aif', 'aifc', 'au', 'snd', 'caf', 'w64', 'wv',
    'mp4', 'm4a', 'm4b', 'aac', 'wma', 'asf',
    'mts', 'm2ts', 'ts', 'ac3', 'eac3', 'mkv', 'mka', 'webm', 'avi', 'mov',
]


class NativeDriver(AudioDriver):
    """Default driver: the C++ libav stage decoding straight to the model
    rate (mono float32)."""

    def __init__(self, path, target_rate=16000):
        self._s = NativeStream(path, target_rate)
        self.samplerate = self._s.samplerate
        self.native_samplerate = self._s.native_samplerate
        # output is already mono; expose channels=1 so downmix is a no-op
        self.channels = 1
        self.source_channels = self._s.channels
        self.frames = self._s.frames
        self.codec = self._s.codec

    def read(self, n, dtype=None):
        # honor the AudioDriver contract's dtype (NativeStream dispatches
        # int16 to the fused native path; anything else converts)
        return self._s.read(n, dtype=dtype or np.float32)

    def read_s16(self, n):
        # decode straight to the int16 wire format (fused in the C stage) —
        # the streamer prefers this when the model transfers int16
        return self._s.read_s16(n)

    def read_mulaw(self, n):
        # mu-law int8 wire format, likewise fused into the decode pass
        return self._s.read_mulaw(n)

    def seek(self, sample):
        return self._s.seek(sample)

    def tell(self):
        return self._s.tell()

    def close(self):
        self._s.close()


def _discover_plugin_drivers():
    """Import per-extension driver modules from the drivers/ directory.

    A module defines ``EXTENSIONS`` (list of str) and a ``Driver`` class
    accepting (path, target_rate). Parity with the reference's dynamic
    driver discovery (`src/stream/audio.py:27-34`).
    """
    plugins = {}
    dir_drivers = os.path.join(os.path.dirname(__file__), 'drivers')
    if not os.path.isdir(dir_drivers):
        return plugins
    for fname in sorted(os.listdir(dir_drivers)):
        if not fname.endswith('.py') or fname.startswith('_'):
            continue
        path = os.path.join(dir_drivers, fname)
        spec = importlib.util.spec_from_file_location(
            f'buzzdetect_tpu.audio.drivers.{fname[:-3]}', path)
        module = importlib.util.module_from_spec(spec)
        try:
            spec.loader.exec_module(module)
            for ext in getattr(module, 'EXTENSIONS', []):
                plugins[ext.lower()] = module.Driver
        except Exception as e:
            # one broken plugin (syntax error, missing third-party import)
            # must not make ALL audio decoding unimportable — including the
            # built-in native formats every entry point needs at startup
            import warnings
            warnings.warn(f'skipping broken audio driver plugin {fname}: '
                          f'{type(e).__name__}: {e}')
    return plugins


def _build_driver_map():
    m = {ext: NativeDriver for ext in NATIVE_EXTENSIONS}
    m.update(_discover_plugin_drivers())
    return m


driver_map = _build_driver_map()


def build_track(path_audio: str, target_rate: int = 16000) -> AudioDriver:
    ext = os.path.splitext(path_audio)[1].lower().lstrip('.')
    if ext not in driver_map:
        raise UnsupportedFormat(f'unsupported audio format: .{ext}')
    return driver_map[ext](path_audio, target_rate)


def get_duration(track: AudioDriver) -> float:
    """Duration in seconds from container metadata (may overestimate for
    truncated recordings; short reads downstream correct for that, as in the
    reference's handle_bad_read path)."""
    if track.frames is None or track.frames < 0:
        raise ValueError('container reports no duration')
    return track.frames / track.samplerate
