"""FiLM conditioning (feature-wise linear modulation).

Parity target: reference ``film()`` (blocks.py:57-63): the conditioning
vector carries (gamma, beta) stacked on the channel axis.
Here channels are last: x ``(B, T, C)``, y ``(B, 2C)`` or ``(B, T, 2C)``.
"""
import jax.numpy as jnp


def film(x, y):
    c = x.shape[-1]
    if y.shape[-1] != 2 * c:
        raise ValueError(
            f"FiLM conditioning must have 2x channels of input ({y.shape[-1]} vs {c})"
        )
    if y.ndim < x.ndim:
        y = jnp.expand_dims(y, axis=tuple(range(1, 1 + x.ndim - y.ndim)))
    gamma = y[..., :c]
    beta = y[..., c:]
    return gamma * x + beta
