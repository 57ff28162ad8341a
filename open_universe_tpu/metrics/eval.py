"""In-training validation metrics.

Parity target: reference ``EvalMetrics`` (metrics/eval.py:31-101):
computes LSD always, plus PESQ/DNSMOS at 16 kHz. In this environment
PESQ (C ext) and DNSMOS (onnxruntime) are unavailable, so they are
gracefully gated; STOI/ESTOI/SI-SDR are computed natively instead.
"""
import math

import numpy as np

from .lsd import log_spectral_distance
from .sisdr import si_sdr
from .stoi import stoi

from .pesq import is_available as _pesq_available, pesq as _pesq_fn


class EvalMetrics:
    def __init__(self, pesq_mode: str = "wb", audio_fs: int = 16000,
                 with_stoi: bool = True):
        self.mode = pesq_mode
        self.eval_fs = 16000
        self.audio_fs = audio_fs
        self.with_stoi = with_stoi

    def _resample(self, x):
        if self.audio_fs == self.eval_fs:
            return x
        from scipy.signal import resample_poly
        g = math.gcd(self.audio_fs, self.eval_fs)
        return resample_poly(x, self.eval_fs // g, self.audio_fs // g,
                             axis=-1)

    def __call__(self, est, ref):
        """est/ref: (B, T) or (B, 1, T)-like arrays -> dict of scalars."""
        est = np.asarray(est)
        ref = np.asarray(ref)
        if est.ndim == 3:
            est = est[:, :, 0] if est.shape[-1] == 1 else est[:, 0, :]
            ref = ref[:, :, 0] if ref.shape[-1] == 1 else ref[:, 0, :]

        metrics = {"lsd": float(np.mean(log_spectral_distance(est, ref)))}
        est16 = self._resample(est)
        ref16 = self._resample(ref)

        metrics["si-sdr"] = float(np.mean(si_sdr(est16, ref16)))

        if self.with_stoi:
            vals = [stoi(e, r, self.eval_fs, extended=True)
                    for e, r in zip(est16, ref16)]
            vals = [v for v in vals if not math.isnan(v)]
            if vals:
                metrics["estoi"] = float(np.mean(vals))

        if _pesq_available():
            vals = []
            for e, r in zip(est16, ref16):
                try:
                    vals.append(_pesq_fn(self.eval_fs, r, e, self.mode))
                except Exception:
                    continue
            if vals:
                metrics["pesq"] = float(np.mean(vals))

        return metrics
