"""ctypes bindings to the native decode stage (libbuzz_decode.so).

The shared library is built on demand from ``csrc/buzz_decode.cpp`` (make,
g++, FFmpeg dev headers — all in the image). ctypes calls release the GIL, so
multiple streamer threads decode genuinely in parallel — the concurrency the
reference only approximates through TF/PyAV GIL-release windows
(`docs/source/tuning.rst:76` attributes its chunk-length sweet spot to GIL
contention; this stage removes the contention entirely).
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_CSRC = os.path.join(_DIR, 'csrc')
_SO = os.path.join(_CSRC, 'libbuzz_decode.so')

_lib = None
_lib_lock = threading.Lock()


class DecodeError(RuntimeError):
    pass


def _build():
    """Rebuild the .so, serialized ACROSS processes with a file lock (two
    pytest workers or CLI+doctor starting together must not compile
    concurrently); the Makefile itself writes via compile-to-temp + atomic
    rename so even an unlocked reader can never dlopen a half-written
    library."""
    lock_path = os.path.join(_CSRC, '.build.lock')
    with open(lock_path, 'w') as lock_f:
        try:
            import fcntl
            fcntl.flock(lock_f, fcntl.LOCK_EX)
        except ImportError:  # non-POSIX: atomic rename still protects loads
            pass
        src = os.path.join(_CSRC, 'buzz_decode.cpp')
        if (os.path.exists(_SO)
                and os.path.getmtime(_SO) >= os.path.getmtime(src)):
            return  # another process built it while we waited on the lock
        try:
            subprocess.run(['make', '-C', _CSRC, '-s'], check=True,
                           capture_output=True, text=True)
        except subprocess.CalledProcessError as e:
            raise DecodeError(
                f'failed to build native decoder:\n{e.stdout}\n{e.stderr}'
            ) from e


def get_lib():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_CSRC, 'buzz_decode.cpp')
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(src)):
            _build()
        lib = ctypes.CDLL(_SO)

        lib.bz_open.restype = ctypes.c_void_p
        lib.bz_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                ctypes.c_char_p, ctypes.c_int]
        lib.bz_samplerate.restype = ctypes.c_int
        lib.bz_samplerate.argtypes = [ctypes.c_void_p]
        lib.bz_native_samplerate.restype = ctypes.c_int
        lib.bz_native_samplerate.argtypes = [ctypes.c_void_p]
        lib.bz_channels.restype = ctypes.c_int
        lib.bz_channels.argtypes = [ctypes.c_void_p]
        lib.bz_duration_samples.restype = ctypes.c_longlong
        lib.bz_duration_samples.argtypes = [ctypes.c_void_p]
        lib.bz_tell.restype = ctypes.c_longlong
        lib.bz_tell.argtypes = [ctypes.c_void_p]
        lib.bz_codec.restype = ctypes.c_char_p
        lib.bz_codec.argtypes = [ctypes.c_void_p]
        lib.bz_strategy.restype = ctypes.c_int
        lib.bz_strategy.argtypes = [ctypes.c_void_p]
        lib.bz_read.restype = ctypes.c_longlong
        lib.bz_read.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.c_longlong]
        lib.bz_read_s16.restype = ctypes.c_longlong
        lib.bz_read_s16.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_int16),
                                    ctypes.c_longlong]
        lib.bz_quantize_s16.restype = None
        lib.bz_quantize_s16.argtypes = [ctypes.POINTER(ctypes.c_float),
                                        ctypes.POINTER(ctypes.c_int16),
                                        ctypes.c_longlong]
        lib.bz_read_mulaw.restype = ctypes.c_longlong
        lib.bz_read_mulaw.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_int8),
                                      ctypes.c_longlong]
        lib.bz_mulaw_s8.restype = None
        lib.bz_mulaw_s8.argtypes = [ctypes.POINTER(ctypes.c_float),
                                    ctypes.POINTER(ctypes.c_int8),
                                    ctypes.c_longlong]
        lib.bz_seek.restype = ctypes.c_int
        lib.bz_seek.argtypes = [ctypes.c_void_p, ctypes.c_longlong]
        lib.bz_last_error.restype = ctypes.c_int
        lib.bz_last_error.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_int]
        lib.bz_close.restype = None
        lib.bz_close.argtypes = [ctypes.c_void_p]
        lib.bz_encode_fixture.restype = ctypes.c_int
        lib.bz_encode_fixture.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_char_p, ctypes.c_int, ctypes.c_int]

        _lib = lib
        return _lib


def quantize_s16(samples: np.ndarray) -> np.ndarray:
    """float32 [-1, 1] -> int16 wire format in one native pass (GIL released).

    Preferred over the numpy fallback in utils.quantize_int16: the fused C
    loop makes one pass where numpy chains four full-array temporaries — on
    the single shared host core that is the analysis pipeline's hot spot.
    """
    lib = get_lib()
    samples = np.ascontiguousarray(samples, dtype=np.float32)
    out = np.empty(len(samples), dtype=np.int16)
    lib.bz_quantize_s16(
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        len(samples))
    return out


def mulaw_s8(samples: np.ndarray) -> np.ndarray:
    """float32 [-1, 1] -> mu-law (mu=255) int8 wire format in one native
    pass. See utils.encode_mulaw for the companding law and fallback."""
    lib = get_lib()
    samples = np.ascontiguousarray(samples, dtype=np.float32)
    out = np.empty(len(samples), dtype=np.int8)
    lib.bz_mulaw_s8(
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        len(samples))
    return out


def encode_fixture(path: str, codec: str, sample_rate: int = 48000,
                   channels: int = 1, seconds: float = 5.0,
                   vbr: bool = False):
    """Write a deterministic multi-tone test file (tests/tools only).

    ``vbr=True`` encodes in true variable-bitrate mode with a
    complexity-modulated signal, for exercising seek paths where
    byte-interpolated timestamps lie (VBR MP3)."""
    lib = get_lib()
    err = ctypes.create_string_buffer(256)
    ret = lib.bz_encode_fixture(os.fsencode(path), codec.encode(),
                                sample_rate, channels, seconds, err, 256,
                                1 if vbr else 0)
    if ret != 0:
        raise DecodeError(f'encode_fixture({codec}) failed: '
                          f'{err.value.decode(errors="replace")}')
    return path


class NativeStream:
    """A decoded audio stream: mono float32 at ``target_rate`` (or native).

    read/seek/tell positions are in OUTPUT samples.
    """

    def __init__(self, path: str, target_rate: int = 0):
        self._lib = get_lib()
        err = ctypes.create_string_buffer(512)
        # fsencode, not encode(): recorder media can carry non-UTF-8
        # filenames (surrogate-escaped by os.walk); strict UTF-8 would raise
        # UnicodeEncodeError on a file libav opens fine with the raw bytes
        self._h = self._lib.bz_open(os.fsencode(path), int(target_rate),
                                    err, 512)
        if not self._h:
            raise DecodeError(
                f'cannot open {path}: {err.value.decode(errors="replace")}')
        self.path = path
        self.samplerate = self._lib.bz_samplerate(self._h)
        self.native_samplerate = self._lib.bz_native_samplerate(self._h)
        self.channels = self._lib.bz_channels(self._h)
        self.frames = int(self._lib.bz_duration_samples(self._h))
        self.codec = self._lib.bz_codec(self._h).decode()

    def _handle(self):
        """The live native handle; a closed stream must raise a catchable
        error, not pass NULL into C (which dereferences unconditionally)."""
        if not self._h:
            raise DecodeError(f'stream is closed: {self.path}')
        return self._h

    def read(self, n: int, dtype=np.float32) -> np.ndarray:
        if np.dtype(dtype) == np.int16:
            return self.read_s16(n)
        out = np.empty(int(n), dtype=np.float32)
        got = self._lib.bz_read(
            self._handle(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            int(n))
        if got < 0:
            raise DecodeError(f'read failed: {self.last_error()}')
        return out[:got] if dtype == np.float32 else out[:got].astype(dtype)

    def read_s16(self, n: int) -> np.ndarray:
        """Read quantized to the int16 wire format in the same native pass
        (no float materialization in Python at all)."""
        out = np.empty(int(n), dtype=np.int16)
        got = self._lib.bz_read_s16(
            self._handle(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            int(n))
        if got < 0:
            raise DecodeError(f'read failed: {self.last_error()}')
        return out[:got]

    def read_mulaw(self, n: int) -> np.ndarray:
        """Read companded to the mu-law int8 wire format (one native pass)."""
        out = np.empty(int(n), dtype=np.int8)
        got = self._lib.bz_read_mulaw(
            self._handle(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            int(n))
        if got < 0:
            raise DecodeError(f'read failed: {self.last_error()}')
        return out[:got]

    def seek(self, sample: int):
        ret = self._lib.bz_seek(self._handle(), int(sample))
        if ret < 0:
            raise DecodeError(f'seek({sample}) failed: {self.last_error()}')
        return int(sample)

    def tell(self) -> int:
        return int(self._lib.bz_tell(self._handle()))

    def last_error(self) -> str:
        buf = ctypes.create_string_buffer(512)
        self._lib.bz_last_error(self._handle(), buf, 512)
        return buf.value.decode(errors='replace')

    def close(self):
        if self._h:
            self._lib.bz_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
