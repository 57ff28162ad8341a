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


# Pallas fused-recurrence toggle (see ops/pallas_gru.py). Off by default;
# enable for TPU serving via set_use_pallas_gru(True).
_USE_PALLAS_GRU = [False]


def set_use_pallas_gru(enabled: bool):
    _USE_PALLAS_GRU[0] = bool(enabled)


def use_pallas_gru() -> bool:
    return _USE_PALLAS_GRU[0]


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
        from .conv import get_compute_dtype
        cd = get_compute_dtype()
        x = x.astype(cd)
        x_proj = x @ w_ih.astype(cd) + b_ih.astype(cd)  # one MXU matmul
        w_hh = w_hh.astype(cd)
        b_hh = b_hh.astype(cd)
        h0 = jnp.zeros((x.shape[0], h), x.dtype)
        return gru_scan(x_proj, h0, w_hh, b_hh, reverse=reverse)


class BiGRUFused(nn.Module):
    """Bidirectional GRU layer with BOTH directions in ONE scan.

    The backward direction runs on the time-reversed sequence stacked on
    the batch axis, so the serial dependency chain is traversed once
    (halves the number of sequential steps dispatched vs two scans —
    the GRU is the model's only sequential op, SURVEY.md §7 hard parts).
    """
    hidden_size: int

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        h = self.hidden_size
        bound = 1.0 / math.sqrt(h)
        # separate weights per direction, stacked for one batched scan
        w_ih_f = self.param("fwd_w_ih", _uniform_init(bound), (in_dim, 3 * h))
        b_ih_f = self.param("fwd_b_ih", _uniform_init(bound), (3 * h,))
        w_hh_f = self.param("fwd_w_hh", _uniform_init(bound), (h, 3 * h))
        b_hh_f = self.param("fwd_b_hh", _uniform_init(bound), (3 * h,))
        w_ih_b = self.param("bwd_w_ih", _uniform_init(bound), (in_dim, 3 * h))
        b_ih_b = self.param("bwd_b_ih", _uniform_init(bound), (3 * h,))
        w_hh_b = self.param("bwd_w_hh", _uniform_init(bound), (h, 3 * h))
        b_hh_b = self.param("bwd_b_hh", _uniform_init(bound), (3 * h,))

        from .conv import get_compute_dtype
        cd = get_compute_dtype()
        x = x.astype(cd)
        b = x.shape[0]
        xp_f = x @ w_ih_f.astype(cd) + b_ih_f.astype(cd)    # (B, T, 3H)
        xp_b = x[:, ::-1, :] @ w_ih_b.astype(cd) + b_ih_b.astype(cd)
        xp = jnp.concatenate([xp_f, xp_b], axis=0)          # (2B, T, 3H)
        w_hh = jnp.stack([w_hh_f, w_hh_b]).astype(cd)       # (2, H, 3H)
        b_hh = jnp.stack([b_hh_f, b_hh_b]).astype(cd)

        xs = jnp.swapaxes(xp, 0, 1)  # (T, 2B, 3H)
        if use_pallas_gru():
            from .pallas_gru import pallas_bigru_sequence
            ys = pallas_bigru_sequence(xs, w_hh, b_hh)
        else:
            def step(hc, inp):
                # hc: (2B, H); per-direction recurrent matmul batched as
                # block-diagonal einsum over the direction axis
                h2 = hc.reshape(2, b, h)
                gates_h = (jnp.einsum("dbh,dhg->dbg", h2, w_hh)
                           + b_hh[:, None, :])
                gates_h = gates_h.reshape(2 * b, 3 * h)
                hr, hz, hn = jnp.split(gates_h, 3, axis=-1)
                xr, xz, xn = jnp.split(inp, 3, axis=-1)
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                n = jnp.tanh(xn + r * hn)
                h_new = (1.0 - z) * n + z * hc
                return h_new, h_new

            h0 = jnp.zeros((2 * b, h), x.dtype)
            _, ys = jax.lax.scan(step, h0, xs, unroll=2)
        ys = jnp.swapaxes(ys, 0, 1)  # (2B, T, H)
        fwd, bwd = ys[:b], ys[b:, ::-1, :]
        return jnp.concatenate([fwd, bwd], axis=-1)


class GRU(nn.Module):
    """(Bi)directional multi-layer GRU, input/output (B, T, C).

    Bidirectional layers use the fused single-scan formulation; parameter
    names stay loadable from the two-scan layout via ``fwd_``/``bwd_``
    prefixes (torch-compatible gate math either way).
    """
    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x):
        for layer in range(self.num_layers):
            if self.bidirectional:
                x = BiGRUFused(self.hidden_size, name=f"l{layer}")(x)
            else:
                x = GRUCellParams(self.hidden_size, name=f"l{layer}_fwd")(x)
        return x


def BiGRU(hidden_size: int, num_layers: int = 1, name=None):
    """Bidirectional GRU whose output dim == 2*hidden_size."""
    return GRU(hidden_size=hidden_size, num_layers=num_layers,
               bidirectional=True, name=name)
