"""Diffusion sigma/time embeddings.

Parity targets: reference ``SigmaBlock`` (random Fourier features of
log10(sigma), sigma_block.py:36-57) and ``SimpleTimeEmbedding``
(learned-frequency sinusoid bank, sigma_block.py:60-78; the UNIVERSE++
default, config/model/default.yaml:26).
"""
import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from .conv import Dense, PReLU


class SigmaBlock(nn.Module):
    """RFF(log10 sigma) -> 3x (Linear -> PReLU) -> (B, n_dim)."""
    n_rff: int = 32
    n_dim: int = 256
    scale: float = 16.0

    @nn.compact
    def __call__(self, log10_sigma):
        # non-trainable random frequencies, serialized with the params
        freq = self.param(
            "freq", lambda k: self.scale * jax.random.normal(k, (self.n_rff,)))
        freq = jax.lax.stop_gradient(freq)
        p = 2.0 * math.pi * freq[None, :] * log10_sigma[:, None]
        g = jnp.concatenate([jnp.sin(p), jnp.cos(p)], axis=-1)
        for i, dim in enumerate([4 * self.n_rff, 8 * self.n_rff, self.n_dim]):
            g = Dense(dim, name=f"layer{i + 1}")(g)
            g = PReLU(name=f"prelu{i + 1}")(g)
        return g


class SimpleTimeEmbedding(nn.Module):
    """Sinusoid bank with a learned, sigma-dependent base frequency."""
    n_dim: int = 256

    @nn.compact
    def __call__(self, log10_sigma):
        w = self.param("weight", nn.initializers.zeros, (1, 1))
        b = self.param("bias", nn.initializers.zeros, (1, 1))
        t = jnp.arange(self.n_dim // 2, dtype=log10_sigma.dtype)
        f = 0.5 * jax.nn.sigmoid(w * log10_sigma[:, None] + b)
        p = 2.0 * math.pi * f * t
        return jnp.concatenate([jnp.sin(p), jnp.cos(p)], axis=-1)
