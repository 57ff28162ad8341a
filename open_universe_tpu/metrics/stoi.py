"""STOI / ESTOI intelligibility metrics (numpy implementation).

Replaces the reference's ``pystoi`` dependency (metrics/wrapper.py:30)
with a from-scratch implementation of the published algorithms:
  - STOI: Taal, Hendriks, Heusdens, Jensen, "An Algorithm for
    Intelligibility Prediction of Time-Frequency Weighted Noisy Speech",
    IEEE TASLP 2011.
  - ESTOI: Jensen & Taal, "An Algorithm for Predicting the Intelligibility
    of Speech Masked by Modulated Noise Maskers", IEEE TASLP 2016.
"""
import math

import numpy as np
from scipy.signal import resample_poly

FS = 10000          # internal rate
N_FRAME = 256       # 25.6 ms frames
NFFT = 512
HOP = N_FRAME // 2
NUM_BANDS = 15
MIN_FREQ = 150.0
SEG_LEN = 30        # analysis segment (384 ms)
BETA = -15.0        # SDR clipping (dB)
DYN_RANGE = 40.0    # silent-frame energy range (dB)


def _hann(n):
    return np.hanning(n + 2)[1:-1]


def _thirdoct(fs=FS, nfft=NFFT, num_bands=NUM_BANDS, min_freq=MIN_FREQ):
    """1/3-octave band matrix (num_bands, nfft//2+1)."""
    f = np.linspace(0, fs / 2, nfft // 2 + 1)
    k = np.arange(num_bands)
    cf = min_freq * 2.0 ** (k / 3.0)
    lo = cf * 2.0 ** (-1.0 / 6.0)
    hi = cf * 2.0 ** (1.0 / 6.0)
    obm = np.zeros((num_bands, len(f)))
    for i in range(num_bands):
        lo_i = np.argmin((f - lo[i]) ** 2)
        hi_i = np.argmin((f - hi[i]) ** 2)
        obm[i, lo_i:hi_i] = 1.0
    return obm


def _remove_silent_frames(x, y, dyn_range=DYN_RANGE):
    w = _hann(N_FRAME)
    n_frames = (len(x) - N_FRAME) // HOP + 1
    if n_frames < 1:
        return x, y
    idx = np.arange(N_FRAME)[None, :] + HOP * np.arange(n_frames)[:, None]
    xf = x[idx] * w
    yf = y[idx] * w
    energy = 20.0 * np.log10(np.linalg.norm(xf, axis=1) + 1e-12)
    mask = energy > (energy.max() - dyn_range)
    xf, yf = xf[mask], yf[mask]
    if len(xf) == 0:
        return x[:0], y[:0]
    # overlap-add reconstruction
    n_out = (len(xf) - 1) * HOP + N_FRAME
    xr = np.zeros(n_out)
    yr = np.zeros(n_out)
    wsum = np.zeros(n_out)
    for i in range(len(xf)):
        s = i * HOP
        xr[s : s + N_FRAME] += xf[i]
        yr[s : s + N_FRAME] += yf[i]
        wsum[s : s + N_FRAME] += w
    wsum = np.maximum(wsum, 1e-8)
    return xr / wsum * 1.0, yr / wsum * 1.0


def _band_spectrogram(x, obm):
    w = _hann(N_FRAME)
    n_frames = (len(x) - N_FRAME) // HOP + 1
    idx = np.arange(N_FRAME)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = x[idx] * w
    spec = np.fft.rfft(frames, n=NFFT, axis=-1)
    power = np.abs(spec) ** 2
    return np.sqrt(obm @ power.T)  # (bands, frames)


def stoi(est, ref, fs: int, extended: bool = False) -> float:
    """STOI/ESTOI of est vs clean ref (1-D arrays)."""
    est = np.asarray(est, np.float64).reshape(-1)
    ref = np.asarray(ref, np.float64).reshape(-1)
    n = min(len(est), len(ref))
    est, ref = est[:n], ref[:n]
    if fs != FS:
        g = math.gcd(fs, FS)
        est = resample_poly(est, FS // g, fs // g)
        ref = resample_poly(ref, FS // g, fs // g)

    ref, est = _remove_silent_frames(ref, est)
    if len(ref) < N_FRAME + HOP * (SEG_LEN - 1):
        return float("nan")

    obm = _thirdoct()
    X = _band_spectrogram(ref, obm)  # clean
    Y = _band_spectrogram(est, obm)  # degraded
    m = X.shape[1]
    if m < SEG_LEN:
        return float("nan")

    if not extended:
        c = 10.0 ** (-BETA / 20.0)
        d_sum, count = 0.0, 0
        for mm in range(SEG_LEN, m + 1):
            Xs = X[:, mm - SEG_LEN : mm]
            Ys = Y[:, mm - SEG_LEN : mm]
            alpha = (np.linalg.norm(Xs, axis=1, keepdims=True)
                     / (np.linalg.norm(Ys, axis=1, keepdims=True) + 1e-12))
            Yp = np.minimum(Ys * alpha, Xs * (1.0 + c))
            xm = Xs - Xs.mean(axis=1, keepdims=True)
            ym = Yp - Yp.mean(axis=1, keepdims=True)
            d = (xm * ym).sum(axis=1) / (
                np.linalg.norm(xm, axis=1) * np.linalg.norm(ym, axis=1) + 1e-12)
            d_sum += d.sum()
            count += len(d)
        return float(d_sum / count)

    # ESTOI
    d_sum, count = 0.0, 0
    for mm in range(SEG_LEN, m + 1):
        Xs = X[:, mm - SEG_LEN : mm]
        Ys = Y[:, mm - SEG_LEN : mm]

        def row_col_norm(a):
            a = a - a.mean(axis=1, keepdims=True)
            a = a / (np.linalg.norm(a, axis=1, keepdims=True) + 1e-12)
            a = a - a.mean(axis=0, keepdims=True)
            a = a / (np.linalg.norm(a, axis=0, keepdims=True) + 1e-12)
            return a

        Xn = row_col_norm(Xs)
        Yn = row_col_norm(Ys)
        d_sum += float((Xn * Yn).sum() / SEG_LEN)
        count += 1
    return float(d_sum / count)
