"""Signal pre-conditioning transforms (spectrogram-domain diffusion).

Parity target: reference ``IdentityTransform`` / ``CompressedMagSTFT`` /
``CompressedMagSTFTPadded`` (layers/dyn_range_comp.py:28-226): complex
STFT with exponent or log magnitude compression, real/imag stacked on the
channel... here the FREQ x {re,im} product becomes the channels-last dim:
waveform (B, T, 1) <-> compressed spec (B, frames, 2*n_freq).
"""
from functools import lru_cache
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .stft import hann_window, istft, stft


def get_window(window_type: str, n: int) -> np.ndarray:
    if window_type == "hann":
        return hann_window(n)
    if window_type == "sqrthann":
        return np.sqrt(hann_window(n))
    if window_type == "hamming":
        return (0.54 - 0.46 * np.cos(
            2.0 * np.pi * np.arange(n) / n)).astype(np.float32)
    raise NotImplementedError(window_type)


class IdentityTransform:
    def __call__(self, x, inv: bool = False, length=None):
        return x

    def inv(self, x, length=None):
        return x


class CompressedMagSTFT:
    """exponent: spec' = factor * |spec|^(e-1) * spec; log: sign-log."""

    def __init__(self, n_fft: int, hop_length: int, window_name: str = "hann",
                 transform_type: str = "exponent", abs_exponent: float = 0.5,
                 factor: float = 0.15):
        self.n_fft = n_fft
        self.hop = hop_length
        self.window = jnp.asarray(get_window(window_name, n_fft))
        self.transform_type = transform_type
        self.abs_exponent = abs_exponent
        self.factor = factor

    def _fwd_compress(self, spec):
        t = self.transform_type
        if t == "exponent":
            if self.abs_exponent != 1:
                e = self.abs_exponent
                mag = jnp.abs(spec)
                spec = (1e-7 + mag) ** (e - 1.0) * spec
            return spec * self.factor
        if t == "log":
            sgn = spec / jnp.maximum(jnp.abs(spec), 1e-12)
            return jnp.log1p(jnp.abs(spec)) * sgn * self.factor
        if t == "none":
            return spec
        raise NotImplementedError(t)

    def _bwd_compress(self, spec):
        t = self.transform_type
        if t == "exponent":
            spec = spec / self.factor
            if self.abs_exponent != 1:
                e = self.abs_exponent
                mag = jnp.abs(spec)
                spec = (1e-7 + mag) ** (1.0 / e - 1.0) * spec
            return spec
        if t == "log":
            spec = spec / self.factor
            sgn = spec / jnp.maximum(jnp.abs(spec), 1e-12)
            return (jnp.exp(jnp.abs(spec)) - 1.0) * sgn
        if t == "none":
            return spec
        raise NotImplementedError(t)

    def n_frames(self, t: int) -> int:
        """STFT frame count for a length-``t`` waveform (center=True)."""
        return 1 + (t + 2 * (self.n_fft // 2) - self.n_fft) // self.hop

    def __call__(self, x, inv: bool = False, length: Optional[int] = None):
        if inv:
            return self.inv(x, length=length)
        # x: (B, T, 1) waveform -> (B, frames, 2F)
        w = x[..., 0]
        spec = stft(w, self.n_fft, self.hop, window=self.window,
                    center=True, pad_mode="constant")  # (B, NF, F)
        spec = self._fwd_compress(spec)
        return jnp.concatenate([spec.real, spec.imag], axis=-1)

    def inv(self, x, length: Optional[int] = None):
        # x: (B, frames, 2F) -> (B, T, 1)
        n_freq = x.shape[-1] // 2
        spec = x[..., :n_freq] + 1j * x[..., n_freq:]
        spec = self._bwd_compress(spec)
        wav = istft(spec, self.n_fft, self.hop, window=self.window,
                    center=True, length=length)
        return wav[..., None]
