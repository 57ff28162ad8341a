"""PESQ (perceptual speech quality) metric.

Parity target: reference ``metrics/pesq.py`` + ``metrics/wrapper.py:29``,
which call the ``pesq`` PyPI package (a wrapper around the ITU-T P.862
reference C code). Resolution order here:

1. the ``pesq`` C extension, when installed — canonical scores;
2. the in-repo native scorer ``native/pesq.cpp`` (built on demand), a
   from-spec C++ reimplementation of the P.862 family (P.862.1 narrowband
   and P.862.2 wideband MOS-LQO mappings). It is validated on behavioral
   anchors (identity -> max score, SNR monotonicity, gain/delay
   invariance) rather than ITU conformance vectors; see pesq.cpp's header
   for the documented simplifications.

API matches the ``pesq`` package: ``pesq(fs, ref, deg, mode)`` with mode
``"wb"`` (fs 16000) or ``"nb"`` (fs 8000).
"""
import ctypes
from pathlib import Path

import numpy as np

try:  # canonical ITU wrapper, if installed
    from pesq import pesq as _itu_pesq
except ImportError:
    _itu_pesq = None

_LIB = None
_LIB_PATH = Path(__file__).parent.parent / "native" / "libouniv_pesq.so"


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _LIB_PATH.exists():
        import subprocess

        src = _LIB_PATH.parent / "pesq.cpp"
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB_PATH),
                 str(src), "-lm"],
                check=True, capture_output=True)
        except Exception:
            return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    for fn in (lib.pesq_mos, lib.pesq_raw):
        fn.restype = ctypes.c_double
        fn.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                       ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                       ctypes.c_int32]
    _LIB = lib
    return lib


def is_available() -> bool:
    return _itu_pesq is not None or _load() is not None


def native_pesq(fs: int, ref, deg, mode: str = "wb", raw: bool = False):
    """In-repo native scorer only (no C-ext fallback)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native PESQ library unavailable (g++ missing?)")
    if mode == "wb" and fs != 16000:
        raise ValueError("wb mode requires fs=16000")
    if mode == "nb" and fs != 8000:
        raise ValueError("nb mode requires fs=8000")
    ref = np.ascontiguousarray(np.asarray(ref, np.float32).reshape(-1))
    deg = np.ascontiguousarray(np.asarray(deg, np.float32).reshape(-1))
    fn = lib.pesq_raw if raw else lib.pesq_mos
    out = fn(ref.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(ref),
             deg.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(deg),
             fs)
    if np.isnan(out):
        raise ValueError("PESQ failed (bad fs or input too short)")
    return float(out)


def pesq(fs: int, ref, deg, mode: str = "wb") -> float:
    """MOS-LQO; prefers the canonical C extension when installed."""
    if _itu_pesq is not None:
        return float(_itu_pesq(fs, np.asarray(ref, np.float32).reshape(-1),
                               np.asarray(deg, np.float32).reshape(-1), mode))
    return native_pesq(fs, ref, deg, mode)
