"""Pallas TPU kernel: fused bidirectional GRU sequence.

The GRU bottleneck is the model's only sequential op (~T/160 steps). The
lax.scan formulation dispatches one tiny matmul per step through XLA's
loop machinery; this kernel runs the WHOLE recurrence in one Pallas
program: the recurrent weights stay resident in VMEM, the per-step input
projections stream in (auto double-buffered by the grid pipeline), and
the hidden state lives in a VMEM scratch that persists across grid steps.

Layout: both directions stacked on the batch axis (see
ops/gru.py:BiGRUFused); x_proj (T, 2B, 3H) -> ys (T, 2B, H).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_seq_kernel(xp_ref, whh_ref, bhh_ref, out_ref, h_scratch):
    """One grid step = one timestep. h persists in scratch across steps."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    h = h_scratch[...]                      # (2B, H) f32
    b2, hidden = h.shape
    b = b2 // 2

    # per-direction recurrent matmul (block-diagonal over direction axis)
    gh_f = jnp.dot(h[:b], whh_ref[0], preferred_element_type=jnp.float32)
    gh_b = jnp.dot(h[b:], whh_ref[1], preferred_element_type=jnp.float32)
    gates_h = jnp.concatenate([gh_f + bhh_ref[0][None, :],
                               gh_b + bhh_ref[1][None, :]], axis=0)

    xp = xp_ref[0]                          # (2B, 3H)
    xr = xp[:, :hidden]
    xz = xp[:, hidden : 2 * hidden]
    xn = xp[:, 2 * hidden :]
    hr = gates_h[:, :hidden]
    hz = gates_h[:, hidden : 2 * hidden]
    hn = gates_h[:, 2 * hidden :]

    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    h_new = (1.0 - z) * n + z * h

    h_scratch[...] = h_new
    out_ref[0] = h_new.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def pallas_bigru_sequence(x_proj, w_hh, b_hh, interpret: bool = False):
    """Run the stacked-direction GRU recurrence.

    x_proj: (T, 2B, 3H) input projections (both directions stacked;
            backward half already time-reversed)
    w_hh:   (2, H, 3H)  recurrent weights per direction
    b_hh:   (2, 3H)     recurrent biases
    Returns ys (T, 2B, H).
    """
    t, b2, h3 = x_proj.shape
    hidden = h3 // 3
    out_dtype = x_proj.dtype

    return pl.pallas_call(
        _gru_seq_kernel,
        out_shape=jax.ShapeDtypeStruct((t, b2, hidden), out_dtype),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b2, h3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hidden, h3), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b2, hidden), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b2, hidden), jnp.float32)],
        interpret=interpret,
    )(x_proj, w_hh, b_hh)
