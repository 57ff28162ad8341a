"""Multi-resolution L1 time + STFT magnitude loss.

Parity target: reference ``MultiResL1SpecLoss``
(losses/multires_stft.py:20-129, ESPnet-SE L3DAS22 recipe):
weighted sum of time-domain L1 and per-resolution STFT magnitude L1,
optional scale-invariant projection; STFT center=True, constant padding.
"""
from typing import Optional, Sequence

import jax.numpy as jnp

from ..ops.stft import hann_window, stft


class MultiResL1SpecLoss:
    def __init__(self, window_sz: Sequence[int] = (512,),
                 hop_sz: Optional[Sequence[int]] = None, eps: float = 1e-8,
                 time_domain_weight: float = 0.5,
                 scale_invariant: bool = False):
        assert all(w % 2 == 0 for w in window_sz)
        self.window_sz = tuple(window_sz)
        self.hop_sz = tuple(hop_sz) if hop_sz else tuple(
            w // 2 for w in window_sz)
        self.eps = eps
        self.time_domain_weight = time_domain_weight
        self.scale_invariant = scale_invariant

    def __call__(self, target, estimate):
        """target/estimate: (B, T) or (B, T, C); returns scalar."""
        if target.ndim == 3:
            target = target[..., 0]
            estimate = estimate[..., 0]
        if self.scale_invariant:
            scale = (jnp.sum(estimate * target, -1, keepdims=True)
                     / (jnp.sum(estimate**2, -1, keepdims=True) + self.eps))
        else:
            scale = 1.0
        est = estimate * scale
        time_l = jnp.mean(jnp.abs(est - target), axis=-1)

        if not self.window_sz:
            return jnp.mean(time_l)

        spec_l = jnp.zeros_like(time_l)
        for w, h in zip(self.window_sz, self.hop_sz):
            ts = stft(target, w, h, center=True, pad_mode="constant")
            es = stft(est, w, h, center=True, pad_mode="constant")
            tm = jnp.sqrt(ts.real**2 + ts.imag**2 + 1e-12)
            em = jnp.sqrt(es.real**2 + es.imag**2 + 1e-12)
            spec_l = spec_l + jnp.mean(jnp.abs(em - tm), axis=(-2, -1))
        total = (time_l * self.time_domain_weight
                 + (1.0 - self.time_domain_weight) * spec_l
                 / len(self.window_sz))
        return jnp.mean(total)
