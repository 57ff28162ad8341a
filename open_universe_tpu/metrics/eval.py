"""In-training validation metrics.

Parity target: reference ``EvalMetrics`` (metrics/eval.py:31-101):
computes LSD always, plus PESQ/DNSMOS at 16 kHz. In this environment
PESQ (C ext) and DNSMOS (onnxruntime) are unavailable, so they are
gracefully gated; STOI/ESTOI/SI-SDR are computed natively instead.

``AsyncEvalMetrics`` moves the host-side metric computation (PESQ, STOI,
DNSMOS — pure CPU work) off the TPU critical path: the validation loop
submits (est, ref) pairs and keeps dispatching enhance() steps; results
are gathered with ``drain()``. The reference computes these inline in
``validation_step`` (universe.py:706-720), stalling the accelerator.
"""
import math
import queue
import threading

import numpy as np

from .lsd import log_spectral_distance
from .sisdr import sdr, si_sdr
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
        # non-scale-invariant SDR + output/ref RMS ratio: cheap diagnostics
        # separating "wrong waveform" from "wrong gain" (a low SI-SDR with
        # rms_ratio ~1 and SDR ~ SI-SDR is genuine waveform mismatch, not a
        # level bug in the serving path)
        metrics["sdr"] = float(np.mean(sdr(est16, ref16)))
        e_rms = np.sqrt(np.mean(est**2, axis=-1))
        r_rms = np.maximum(np.sqrt(np.mean(ref**2, axis=-1)), 1e-8)
        metrics["rms_ratio"] = float(np.mean(e_rms / r_rms))

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


class AsyncEvalMetrics:
    """Background-thread wrapper around a metric callable.

    The worker owns the device->host fetch (np.asarray on a jax array
    blocks only this thread) and the CPU metric math, so the main loop
    can keep the accelerator busy. ``max_pending`` bounds host memory by
    applying backpressure once too many batches are queued.
    """

    def __init__(self, metric_fn, max_pending: int = 8):
        self._fn = metric_fn
        self._q = queue.Queue(maxsize=max_pending)
        self._results = []
        self._errors = []
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                est, ref = item
                self._results.append(self._fn(np.asarray(est),
                                              np.asarray(ref)))
            except Exception as e:  # surfaced on drain()
                self._errors.append(e)
            finally:
                self._q.task_done()

    def submit(self, est, ref):
        self._q.put((est, ref))

    def drain(self):
        """Wait for all submitted work; return the list of result dicts."""
        self._q.join()
        if self._errors:
            err, self._errors = self._errors[0], []
            raise err
        out, self._results = self._results, []
        return out

    def close(self):
        self._q.put(None)
        self._thread.join()
