"""Log-spectral distance.

Parity target: reference ``log_spectral_distance`` (metrics/lsd.py:26-141):
power spectrogram (center=True, window-normalized), 10*log10, p-norm over
(freq, frames) divided by (F*T)^(1/p); optional scale-invariant
projection of the target onto the estimate.
"""
import numpy as np

from ..ops.stft import hann_window


def _power_spec(x, n_fft, hop, win):
    """torch-compatible: center=True reflect pad, power=2, window-normalized."""
    w = hann_window(win, n_fft)
    p = n_fft // 2
    x = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(p, p)], mode="reflect")
    t = x.shape[-1]
    n_frames = 1 + (t - n_fft) // hop
    shape = x.shape[:-1] + (n_frames, n_fft)
    strides = x.strides[:-1] + (x.strides[-1] * hop, x.strides[-1])
    frames = np.lib.stride_tricks.as_strided(x, shape, strides)
    spec = np.fft.rfft(frames * w, axis=-1)
    power = (spec.real**2 + spec.imag**2) / np.sum(w**2)
    return np.moveaxis(power, -1, -2)  # (..., F, frames)


def log_spectral_distance(est, ref, p=2, db=True, n_fft=400, hop_length=160,
                          eps=1e-7, win_length=None, scale_invariant=False):
    """est/ref: (..., T) numpy arrays -> LSD per batch element."""
    est = np.asarray(est, np.float64)
    ref = np.asarray(ref, np.float64)
    if win_length is None:
        win_length = n_fft

    if scale_invariant:
        scale = (np.sum(est * ref, -1, keepdims=True)
                 / (np.sum(est**2, -1, keepdims=True) + eps))
    else:
        scale = 1.0

    se = _power_spec(est, n_fft, hop_length, win_length)
    sr = _power_spec(scale * ref, n_fft, hop_length, win_length)
    if db:
        le = 10.0 * np.log10(se + eps)
        lr = 10.0 * np.log10(sr + eps)
    else:
        le = np.log(se + eps)
        lr = np.log(sr + eps)

    denom = (le.shape[-1] * le.shape[-2]) ** (1.0 / p)
    diff = np.abs(le - lr) ** p
    return np.sum(diff, axis=(-2, -1)) ** (1.0 / p) / denom
