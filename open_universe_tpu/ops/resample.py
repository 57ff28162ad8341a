"""Polyphase windowed-sinc resampling (integer factors).

Functional equivalent of torchaudio.transforms.Resample (hann-windowed
sinc, rolloff 0.99, width 6) used by the reference's alias-free
activations (bigvgan/alias_free_act.py:8-30) and the offline soxr
resampler (prepare/resample.py). Implemented as static-kernel
convolutions: upsampling = per-phase conv + interleave; downsampling =
lowpass conv with stride — both lower to MXU/VPU-friendly convs on TPU.
"""
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _sinc_kernel(orig_freq: int, new_freq: int, lowpass_width: int = 6,
                 rolloff: float = 0.99) -> np.ndarray:
    """Per-phase kernels, shape (new_freq, n_taps) in input-sample units."""
    g = np.gcd(orig_freq, new_freq)
    orig, new = orig_freq // g, new_freq // g
    base = min(orig, new)
    # cutoff (relative to input Nyquist) and half-width in input samples
    cutoff = rolloff * base / orig
    width = int(np.ceil(lowpass_width * orig / base))
    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx
    window = np.cos(np.clip(t * base / lowpass_width, -1, 1) * np.pi / 2) ** 2
    t = t * np.pi * cutoff * orig  # scaled argument
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * cutoff
    return kernel.astype(np.float32), width, orig, new


def resample(x, orig_freq: int, new_freq: int):
    """Resample last-but-one axis (time) of ``x (B, T, C)`` by new/orig."""
    if orig_freq == new_freq:
        return x
    kernels, width, orig, new = _sinc_kernel(orig_freq, new_freq)
    n_taps = kernels.shape[1]
    c = x.shape[-1]
    t_in = x.shape[-2]
    # depthwise conv per phase: (n_taps, 1, C) kernel broadcast over channels
    k = jnp.asarray(kernels)  # (new, n_taps)
    # correlation (no kernel flip): phase-p output at block q is
    # sum_d x[q+d] * K_p[d + width]
    ker = jnp.broadcast_to(k[:, :, None, None].astype(x.dtype),
                           (new, n_taps, 1, c))
    outs = []
    for p in range(new):
        y = jax.lax.conv_general_dilated(
            x, ker[p],
            window_strides=(orig,),
            padding=[(width, width + orig)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=c,
        )
        outs.append(y)
    y = jnp.stack(outs, axis=2)  # (B, Tb, new, C)
    y = y.reshape(y.shape[0], -1, c)
    target_len = int(np.ceil(t_in * new / orig))
    return y[:, :target_len, :]
