"""SSL-feature distance (LMOS) loss.

Parity target: reference ``WavLMLMOSLoss``
(open_universe/losses/wavlm_loss.py:8-76):

    feat_weight * mean((phi(y) - phi(y_hat))**2)
        + mean(|  |STFT(y)| - |STFT(y_hat)|  |)

where ``phi`` is the frozen convolutional front-end of an SSL speech
model (WavLM/wav2vec2 family) and the STFT term is a magnitude L1
(n_fft=1024, hop=256, center=True, reflect pad).

TPU-native design: ``phi`` is a pluggable jittable callable
``wav (B, T) -> (B, F, D)`` so the whole loss stays inside the jit'd
train step (the reference's torch module runs the extractor under
no_grad on the target only; here both branches are traced and the
caller controls stop_gradient semantics). The default feature fn is the
frozen Flax wav2vec2 conv stack from
``models/universe/condition_ssl.make_wav2vec2_feature_fn`` (requires
local weights in this zero-egress image); tests inject a cheap stand-in.
"""
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ops.stft import hann_window, stft


class SSLFeatureLoss:
    """LMOS: weighted SSL-feature MSE + magnitude-STFT L1."""

    def __init__(self, feature_fn: Optional[Callable] = None,
                 model_path: str = "microsoft/wavlm-base",
                 stft_n_fft: int = 1024, stft_hop: int = 256,
                 feat_weight: float = 100.0,
                 stop_gradient_target: bool = True):
        if feature_fn is None:
            from ..models.universe.condition_ssl import (
                make_wav2vec2_feature_fn,
            )
            feature_fn = make_wav2vec2_feature_fn(model_path)
        self.feature_fn = feature_fn
        self.stft_n_fft = stft_n_fft
        self.stft_hop = stft_hop
        self.feat_weight = feat_weight
        self.stop_gradient_target = stop_gradient_target
        self._window = jnp.asarray(hann_window(stft_n_fft))

    @staticmethod
    def _as_bt(x):
        if x.ndim == 3:  # (B, T, 1) or (B, 1, T)
            x = x[..., 0] if x.shape[-1] == 1 else x[:, 0, :]
        return x

    def __call__(self, estimate, target):
        """estimate/target: (B, T) (or (B, T, 1)/(B, 1, T)); returns scalar."""
        est = self._as_bt(estimate).astype(jnp.float32)
        tgt = self._as_bt(target).astype(jnp.float32)
        if self.stop_gradient_target:
            tgt = jax.lax.stop_gradient(tgt)

        phi_est = self.feature_fn(est)
        phi_tgt = jax.lax.stop_gradient(self.feature_fn(tgt))
        l_feat = jnp.mean((phi_tgt.astype(jnp.float32)
                           - phi_est.astype(jnp.float32)) ** 2)

        mag = lambda z: jnp.abs(stft(z, self.stft_n_fft, self.stft_hop,
                                     window=self._window, center=True,
                                     pad_mode="reflect"))
        l_mag = jnp.mean(jnp.abs(mag(tgt) - mag(est)))
        return self.feat_weight * l_feat + l_mag
