"""Snake activations (plain and alias-free).

Parity targets: reference ``Snake``/``SnakeBeta`` (bigvgan/snake.py:11-128)
and ``AliasFreeSnake`` = 2x upsample -> snake -> 2x downsample
(bigvgan/alias_free_act.py:8-30, snake.py:131-157).

snake(x) = x + (1/a) sin^2(a x); with log-scale alpha the parameters are
stored as logs and exponentiated (reference default ``alpha_logscale=True``
for act_type="snake" blocks).
"""
import jax.numpy as jnp
from flax import linen as nn

from .resample import resample


def snake(x, alpha, beta=None, eps: float = 1e-9):
    """snake(x) = x + 1/(beta) * sin^2(alpha*x); beta defaults to alpha."""
    if beta is None:
        beta = alpha
    s = jnp.sin(x * alpha)
    return x + s * s / (beta + eps)


class Snake(nn.Module):
    """Per-channel snake, channels-last input (B, T, C)."""
    features: int
    alpha_logscale: bool = True
    with_beta: bool = False

    @nn.compact
    def __call__(self, x):
        init_val = 0.0 if self.alpha_logscale else 1.0
        alpha = self.param("alpha",
                           lambda k: jnp.full((self.features,), init_val, jnp.float32))
        if self.with_beta:
            beta = self.param("beta",
                              lambda k: jnp.full((self.features,), init_val,
                                                 jnp.float32))
        else:
            beta = alpha
        if self.alpha_logscale:
            alpha = jnp.exp(alpha)
            beta = jnp.exp(beta)
        return snake(x, alpha, beta)


class SnakeAlias(nn.Module):
    """Alias-free snake: 2x oversample around the nonlinearity."""
    features: int
    alpha_logscale: bool = True
    with_beta: bool = False
    up_ratio: int = 2

    @nn.compact
    def __call__(self, x):
        t = x.shape[-2]
        y = resample(x, 1, self.up_ratio)
        y = Snake(self.features, self.alpha_logscale, self.with_beta,
                  name="snake")(y)
        y = resample(y, self.up_ratio, 1)
        return y[:, :t, :]
