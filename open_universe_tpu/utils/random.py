"""Randomness helpers.

Parity target: reference ``center_truncated_normal`` (utils/random.py:32-66)
— but implemented by exact inverse-CDF sampling instead of the reference's
rejection loop, which is data-dependent and would not jit. The output
distribution is identical.
"""
import jax
import jax.numpy as jnp
from jax.scipy.special import ndtri


def center_truncated_normal(key, area=0.95, t_min=0.0, t_max=1.0, shape=(1,)):
    """Truncated normal centered at (t_min+t_max)/2 covering `area` mass."""
    area = jnp.asarray(area)
    q = ndtri(area + 0.5 * (1.0 - area))
    mean = 0.5 * (t_max + t_min)
    std = 0.5 * (t_max - t_min) / q
    lo = 0.5 * (1.0 - area)
    hi = 0.5 * (1.0 + area)
    u = jax.random.uniform(key, shape, minval=lo, maxval=hi)
    return mean + std * ndtri(u)
