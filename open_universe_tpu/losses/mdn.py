"""Mixture density network loss (original UNIVERSE auxiliary losses).

Parity target: reference ``MixtureDensityNetworkLoss`` (mdn.py:36-157):
LayerNorm over (channels, time) with elementwise affine -> conv head
producing (mean, sigma, alpha) x n_comp -> Gaussian-mixture NLL with
log-softmax mixture weights; ELU+1 sigma nonlinearity; per-sample or
global alpha averaging.
"""
import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.universe.blocks import PReLUConv


def elu2(x, alpha=1.0, eps=1e-15):
    return jnp.where(x > 0, x, alpha * (jnp.exp(x) - 1.0)) + 1.0 + eps


def mdn_nll(tgt, mean, sigma, alpha):
    """NLL of a diagonal Gaussian mixture.

    tgt   (B, C, T)
    mean  (B, K, C, T)
    sigma (B, K, C, T)   positive
    alpha (B, K, 1|T... broadcastable logits over K)
    """
    tgt = tgt[:, None]  # (B, 1, C, T)
    sqrt_2_pi = math.sqrt(2.0 * math.pi)
    log_p = -0.5 * ((tgt - mean) / sigma) ** 2
    log_p = log_p - jnp.log(sqrt_2_pi * sigma)
    log_p = log_p + jax.nn.log_softmax(alpha, axis=1)
    log_p = jnp.sum(log_p, axis=(-2, -1))  # (B, K)
    nll = -jax.scipy.special.logsumexp(log_p, axis=-1)
    return nll / (tgt.shape[-1] * tgt.shape[-2])


def mdn_sample(rng, alpha, mean, sigma, random=True):
    """Draw from a diagonal Gaussian mixture, one component per time step.

    Parity target: reference ``MixtureDensityNetworkLoss.sample``
    (mdn.py:127-157) — per-(batch, time) categorical over components from
    the ``alpha`` logits, then a Gaussian draw from the picked component
    (or the argmax component's mean when ``random=False``).

    alpha  (B, K, 1|T)   mixture logits (broadcast over time allowed)
    mean   (B, K, C, T)
    sigma  (B, K, C, T)  positive
    returns (B, C, T)
    """
    b, k, c, t = mean.shape
    logits = jnp.broadcast_to(alpha.reshape(b, k, -1), (b, k, t)) \
        if alpha.reshape(b, k, -1).shape[-1] == 1 else alpha.reshape(b, k, t)
    logits = jnp.swapaxes(logits, 1, 2)  # (B, T, K)
    if random:
        rng_cat, rng_norm = jax.random.split(rng)
        comp = jax.random.categorical(rng_cat, logits, axis=-1)  # (B, T)
        z = jax.random.normal(rng_norm, (b, c, t), mean.dtype)
    else:
        comp = jnp.argmax(logits, axis=-1)  # (B, T)
        z = jnp.zeros((b, c, t), mean.dtype)
    idx = comp[:, None, None, :]  # (B, 1, 1, T)
    pick = lambda x: jnp.take_along_axis(x, idx, axis=1)[:, 0]  # (B, C, T)
    return pick(mean) + z * pick(sigma)


class MixtureDensityNetworkLoss(nn.Module):
    """Trainable MDN head + NLL. Input est (B, T, C_est), tgt (B, T, C_tgt)."""
    est_channels: int
    tgt_channels: int
    n_comp: int = 3
    sample_len: int = 64000  # sampling_rate * sample_len_s (for LayerNorm)
    sigma_eps: float = 1e-5
    alpha_per_sample: bool = False
    reduction: str = "mean"

    @nn.compact
    def __call__(self, est, tgt):
        # LayerNorm over (T, C) with elementwise affine, like torch
        # LayerNorm((C, T)) in the reference (mdn.py:59-61)
        ln_scale = self.param("ln_scale", nn.initializers.ones,
                              (self.sample_len, self.est_channels))
        ln_bias = self.param("ln_bias", nn.initializers.zeros,
                             (self.sample_len, self.est_channels))
        mu = jnp.mean(est, axis=(-2, -1), keepdims=True)
        var = jnp.var(est, axis=(-2, -1), keepdims=True)
        est = (est - mu) / jnp.sqrt(var + 1e-5)
        est = est * ln_scale + ln_bias

        est = PReLUConv(3 * self.n_comp * self.tgt_channels, kernel_size=3,
                        padding="same", name="conv")(est)

        b, t, _ = est.shape
        # channel layout mirrors the reference view
        # (B, 3, n_comp, tgt, T) from channel-major ordering (mdn.py:68)
        x = est.reshape(b, t, 3, self.n_comp, self.tgt_channels)
        x = jnp.moveaxis(x, 1, -1)  # (B, 3, K, C, T)
        mean = x[:, 0]
        sigma = elu2(x[:, 1], eps=self.sigma_eps)
        alpha = x[:, 2]  # (B, K, C, T)
        if self.alpha_per_sample:
            alpha = jnp.mean(alpha, axis=-2, keepdims=True)
        else:
            alpha = jnp.mean(alpha, axis=(-2, -1), keepdims=True)
        alpha = jnp.maximum(alpha, -10.0)

        tgt_ct = jnp.swapaxes(tgt, -2, -1)  # (B, C, T)
        nll = mdn_nll(tgt_ct, mean, sigma, alpha)
        if self.reduction == "mean":
            return jnp.mean(nll)
        if self.reduction == "sum":
            return jnp.sum(nll)
        return nll
