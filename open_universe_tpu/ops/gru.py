"""GRU layers as ``lax.scan`` with hoisted input projections.

Parity target: torch.nn.GRU gate math (used at the reference's score /
conditioner bottlenecks, score.py:83-99, condition.py:173-179):

    r = sigm(W_ir x + b_ir + W_hr h + b_hr)
    z = sigm(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn))
    h' = (1 - z) n + z h

TPU design: the input projection for ALL timesteps is one large (B*T, C) x
(C, 3H) matmul that rides the MXU; only the small recurrent matmul stays
inside the scan. This is the single inherently-sequential op in the model
(~400 frames at 4 s / 16 kHz after x160 downsampling).
"""
import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def _uniform_init(bound):
    def init(key, shape):
        return jax.random.uniform(key, shape, jnp.float32, -bound, bound)
    return init


def gru_scan(x_proj, h0, w_hh, b_hh, reverse: bool = False, unroll: int = 2):
    """Run the recurrence. x_proj: (B, T, 3H) precomputed input projections."""
    hidden = h0.shape[-1]

    def step(h, xp):
        gates_h = h @ w_hh + b_hh  # (B, 3H)
        hr, hz, hn = jnp.split(gates_h, 3, axis=-1)
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    xs = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 3H)
    _, ys = jax.lax.scan(step, h0, xs, reverse=reverse, unroll=unroll)
    return jnp.swapaxes(ys, 0, 1)  # (B, T, H)


class GRUCellParams(nn.Module):
    """One direction of one GRU layer."""
    hidden_size: int

    @nn.compact
    def __call__(self, x, reverse: bool = False):
        in_dim = x.shape[-1]
        h = self.hidden_size
        bound = 1.0 / math.sqrt(h)
        w_ih = self.param("w_ih", _uniform_init(bound), (in_dim, 3 * h))
        b_ih = self.param("b_ih", _uniform_init(bound), (3 * h,))
        w_hh = self.param("w_hh", _uniform_init(bound), (h, 3 * h))
        b_hh = self.param("b_hh", _uniform_init(bound), (3 * h,))
        x_proj = x @ w_ih + b_ih  # one big MXU matmul over (B*T)
        h0 = jnp.zeros((x.shape[0], h), x.dtype)
        return gru_scan(x_proj, h0, w_hh, b_hh, reverse=reverse)


class GRU(nn.Module):
    """(Bi)directional multi-layer GRU, input/output (B, T, C)."""
    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x):
        for layer in range(self.num_layers):
            fwd = GRUCellParams(self.hidden_size, name=f"l{layer}_fwd")(x)
            if self.bidirectional:
                bwd = GRUCellParams(self.hidden_size, name=f"l{layer}_bwd")(
                    x, reverse=True)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
        return x


def BiGRU(hidden_size: int, num_layers: int = 1, name=None):
    """Bidirectional GRU whose output dim == 2*hidden_size."""
    return GRU(hidden_size=hidden_size, num_layers=num_layers,
               bidirectional=True, name=name)
