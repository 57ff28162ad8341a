"""ctypes bindings for the native audio runtime (audio_io.cpp).

Built by ``native/build.sh``; everything degrades gracefully to the pure
Python implementations in ``data/wavio.py`` when the shared library is
absent (``is_available()``).
"""
import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_LIB = None
_LIB_PATH = Path(__file__).parent / "libouniv_audio.so"


def build():
    """Compile the native library in place (g++ required)."""
    subprocess.run(["sh", str(Path(__file__).parent / "build.sh")], check=True)
    return load()


def load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.wav_read.restype = ctypes.c_int64
    lib.wav_read.argtypes = [ctypes.c_char_p,
                             ctypes.POINTER(ctypes.c_float),
                             ctypes.c_int64,
                             ctypes.POINTER(ctypes.c_int32),
                             ctypes.POINTER(ctypes.c_int32)]
    lib.wav_write.restype = ctypes.c_int64
    lib.wav_write.argtypes = [ctypes.c_char_p,
                              ctypes.POINTER(ctypes.c_float),
                              ctypes.c_int64, ctypes.c_int32, ctypes.c_int32]
    lib.wav_info.restype = ctypes.c_int64
    lib.wav_info.argtypes = [ctypes.c_char_p,
                             ctypes.POINTER(ctypes.c_int32),
                             ctypes.POINTER(ctypes.c_int32)]
    lib.resample_poly.restype = ctypes.c_int64
    lib.resample_poly.argtypes = [ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_int64, ctypes.c_int32,
                                  ctypes.c_int32,
                                  ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_int64]
    _LIB = lib
    return lib


def is_available() -> bool:
    return load() is not None


def read_wav(path, max_seconds: float = 600.0):
    """Native WAV read -> (float32 (T, C), fs)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library not built")
    cap = int(max_seconds * 96000 * 2)
    buf = np.empty(cap, np.float32)
    fs = ctypes.c_int32()
    ch = ctypes.c_int32()
    n = lib.wav_read(str(path).encode(),
                     buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                     cap, ctypes.byref(fs), ctypes.byref(ch))
    if n < 0:
        raise IOError(f"native wav_read failed: {path}")
    c = ch.value
    return buf[: n * c].reshape(-1, c).copy(), fs.value


def write_wav(path, samples, fs: int):
    lib = load()
    if lib is None:
        raise RuntimeError("native library not built")
    x = np.ascontiguousarray(samples, np.float32)
    if x.ndim == 1:
        x = x[:, None]
    n = lib.wav_write(str(path).encode(),
                      x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                      x.shape[0], x.shape[1], fs)
    if n < 0:
        raise IOError(f"native wav_write failed: {path}")


def wav_info(path):
    lib = load()
    if lib is None:
        raise RuntimeError("native library not built")
    fs = ctypes.c_int32()
    ch = ctypes.c_int32()
    n = lib.wav_info(str(path).encode(), ctypes.byref(fs), ctypes.byref(ch))
    if n < 0:
        raise IOError(f"native wav_info failed: {path}")
    return {"num_frames": int(n), "sample_rate": fs.value,
            "num_channels": ch.value}


def resample(x, orig_fs: int, new_fs: int):
    """Native polyphase resample of a mono float32 array."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library not built")
    x = np.ascontiguousarray(x, np.float32).reshape(-1)
    cap = int(np.ceil(len(x) * new_fs / orig_fs)) + 16
    out = np.empty(cap, np.float32)
    n = lib.resample_poly(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        orig_fs, new_fs,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap)
    if n < 0:
        raise RuntimeError("native resample failed")
    return out[:n].copy()
