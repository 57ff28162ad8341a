"""Pallas TPU kernel: fused UNIVERSE ConvBlock residual stack.

The ConvBlock stack (reference blocks.py:234-416; ours
models/universe/blocks.py:ConvBlock) is, per block:

    h' = (h + res) / sqrt2                      [decoder only]
    cond_out = conv5(prelu(h')) + b1
    x = (cond_out + input_cond) / sqrt2         [decoder only]
    x = gamma * x + beta                        [film, optional]
    x = conv3(prelu(x)) + b2
    x = conv3(prelu(x)) + b3
    v_out = (h' + x) / sqrt2

Run through XLA this is ~8 HBM round-trips over the activation (three
convs cannot fuse with each other); at the U-Net's high-resolution
levels (T=64k, C=32/64, batch 128 -> 0.5 GB activations in bf16) the
stack is purely HBM-bandwidth-bound. This kernel computes the whole
stack in ONE pass: read h (+res/+input_cond) once, write v_out and
cond_out once — with the conv halos exchanged via tiny precomputed halo
arrays so every activation byte moves exactly once.

Grid: (B, T/tile). Each program holds a (tile + 8, C) window in VMEM
(halo 4 = conv5's 2 + conv3's 1 + conv3's 1) and evaluates the three
convs as tap-shifted matmuls. 'same' conv semantics at the global signal
boundary are preserved by masking intermediate activations outside
[0, T) (each conv zero-pads its OWN input, so halo intermediates at the
signal edges must be zeroed, not computed from padded garbage).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv import get_compute_dtype

INV_SQRT2 = 1.0 / np.sqrt(2.0)
HALO = 4

# Serving-path switch (inference only — the kernel defines no VJP; training
# keeps the XLA path). Mirrors ops/gru.py's set_use_pallas_gru.
_USE_PALLAS_CONV_BLOCK = [False]
_PALLAS_CONV_BLOCK_INTERPRET = [False]


def set_use_pallas_conv_block(enabled: bool, interpret: bool = False):
    _USE_PALLAS_CONV_BLOCK[0] = bool(enabled)
    _PALLAS_CONV_BLOCK_INTERPRET[0] = bool(interpret)


def use_pallas_conv_block() -> bool:
    return _USE_PALLAS_CONV_BLOCK[0]


def pallas_conv_block_interpret() -> bool:
    return _PALLAS_CONV_BLOCK_INTERPRET[0]


def choose_tile(t: int, max_tile: int = 8192) -> int:
    """Largest divisor of ``t`` that is <= max_tile and a multiple of 16
    (sublane alignment for bf16); falls back to padding-by-2048 if none."""
    best = 0
    for d in range(16, max_tile + 1, 16):
        if t % d == 0:
            best = d
    return best if best else 2048


def _conv_taps(x, w_ref, out_len: int):
    """Tap-shifted matmul conv: x (P, C), w (k, C, C) -> (out_len, Cout).

    y[j] = sum_k x[j + k] @ w[k]   (caller aligns offsets so that j=0
    corresponds to the first needed output).
    """
    k = w_ref.shape[0]
    xc = x.astype(w_ref.dtype)  # bf16 operands, f32 accumulation (MXU)
    acc = jnp.zeros((out_len, w_ref.shape[2]), jnp.float32)
    for i in range(k):
        acc += jnp.dot(xc[i : i + out_len], w_ref[i],
                       preferred_element_type=jnp.float32)
    return acc


def _prelu(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def _make_kernel(tile: int, t_true: int, use_res: bool, use_ic: bool,
                 use_film: bool, out_dtype):
    def kernel(*refs):
        i = 0
        h_ref = refs[i]; i += 1
        hl_ref = refs[i]; i += 1
        hr_ref = refs[i]; i += 1
        if use_res:
            r_ref = refs[i]; i += 1
            rl_ref = refs[i]; i += 1
            rr_ref = refs[i]; i += 1
        if use_ic:
            ic_ref = refs[i]; i += 1
            icl_ref = refs[i]; i += 1
            icr_ref = refs[i]; i += 1
        if use_film:
            gb_ref = refs[i]; i += 1
        alpha_ref = refs[i]; i += 1
        w1_ref = refs[i]; i += 1
        b1_ref = refs[i]; i += 1
        w2_ref = refs[i]; i += 1
        b2_ref = refs[i]; i += 1
        w3_ref = refs[i]; i += 1
        b3_ref = refs[i]; i += 1
        vout_ref = refs[i]; i += 1
        cout_ref = refs[i]; i += 1

        ti = pl.program_id(1)
        t0 = ti * tile

        # (tile + 8, C) window: [t0 - 4, t0 + tile + 4)
        h = jnp.concatenate([hl_ref[0, 0], h_ref[0], hr_ref[0, 0]], axis=0)
        h = h.astype(jnp.float32)
        if use_res:
            r = jnp.concatenate([rl_ref[0, 0], r_ref[0], rr_ref[0, 0]],
                                axis=0)
            h = (h + r.astype(jnp.float32)) * INV_SQRT2

        # global positions of the window rows; zero rows outside [0, T)
        pos = t0 - HALO + jax.lax.broadcasted_iota(
            jnp.int32, (tile + 2 * HALO, 1), 0)
        valid = (pos >= 0) & (pos < t_true)
        h = jnp.where(valid, h, 0.0)

        a1 = _prelu(h, alpha_ref[0, 0])
        # y1 on window rows [2, tile+6) == global [t0-2, t0+tile+2)
        y1 = _conv_taps(a1, w1_ref, tile + 4) + b1_ref[0][None, :]

        x = y1
        if use_ic:
            ic = jnp.concatenate(
                [icl_ref[0, 0], ic_ref[0], icr_ref[0, 0]], axis=0)
            x = (x + ic.astype(jnp.float32)[2 : 2 + tile + 4]) * INV_SQRT2
        if use_film:
            c = x.shape[-1]
            gamma = gb_ref[0, :c].astype(jnp.float32)
            beta = gb_ref[0, c:].astype(jnp.float32)
            x = gamma[None, :] * x + beta[None, :]

        # each conv same-pads its OWN input: zero rows outside [0, T)
        x = jnp.where(valid[2 : 2 + tile + 4], x, 0.0)
        a2 = _prelu(x, alpha_ref[0, 1])
        # y2 on window rows [3, tile+5) == global [t0-1, t0+tile+1)
        y2 = _conv_taps(a2, w2_ref, tile + 2) + b2_ref[0][None, :]

        y2 = jnp.where(valid[3 : 3 + tile + 2], y2, 0.0)
        a3 = _prelu(y2, alpha_ref[0, 2])
        # y3 on window rows [4, tile+4) == global [t0, t0+tile)
        y3 = _conv_taps(a3, w3_ref, tile) + b3_ref[0][None, :]

        v = (h[HALO : HALO + tile] + y3) * INV_SQRT2
        vout_ref[0] = v.astype(out_dtype)
        cout_ref[0] = y1[2 : 2 + tile].astype(out_dtype)

    return kernel


def _halo_arrays(x, tile: int):
    """Left/right 4-sample halos per tile: (B, nt, 4, C) each."""
    b, t, c = x.shape
    nt = t // tile
    starts = jnp.arange(nt) * tile
    idx_l = starts[:, None] + jnp.arange(-HALO, 0)[None, :]
    idx_r = starts[:, None] + tile + jnp.arange(HALO)[None, :]
    ml = (idx_l >= 0) & (idx_l < t)
    mr = (idx_r >= 0) & (idx_r < t)
    hl = jnp.take(x, jnp.clip(idx_l, 0, t - 1).reshape(-1), axis=1)
    hr = jnp.take(x, jnp.clip(idx_r, 0, t - 1).reshape(-1), axis=1)
    hl = hl.reshape(b, nt, HALO, c) * ml[None, :, :, None].astype(x.dtype)
    hr = hr.reshape(b, nt, HALO, c) * mr[None, :, :, None].astype(x.dtype)
    return hl, hr


@partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_conv_stack(h, w1, b1, w2, b2, w3, b3, alphas,
                     film_gb=None, input_cond=None, res=None,
                     tile: int = 0, interpret: bool = False):
    """Fused ConvBlock residual stack. h (B, T, C) -> (v_out, cond_out).

    w1 (5, C, C), w2/w3 (3, C, C), b* (C,), alphas (3,) PReLU slopes,
    film_gb (B, 2C) optional, input_cond/res (B, T, C) optional.
    Exactly equivalent to the unfused XLA path (same-pad convs, torch
    PReLU semantics); accumulation in f32, output in h.dtype.
    """
    b, t, c = h.shape
    cd = get_compute_dtype()
    out_dtype = cd  # matches the unfused path (convs emit compute dtype)
    if tile == 0:
        tile = choose_tile(t)
    t_pad = (-t) % tile
    tp = t + t_pad

    def padt(x):
        x = x.astype(cd)  # halve streamed bytes under bf16 serving
        return jnp.pad(x, ((0, 0), (0, t_pad), (0, 0))) if t_pad else x

    hp = padt(h)
    inputs = [hp, *_halo_arrays(hp, tile)]
    specs = [
        pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0)),
        pl.BlockSpec((1, 1, HALO, c), lambda bi, ti: (bi, ti, 0, 0)),
        pl.BlockSpec((1, 1, HALO, c), lambda bi, ti: (bi, ti, 0, 0)),
    ]
    if res is not None:
        rp = padt(res)
        inputs += [rp, *_halo_arrays(rp, tile)]
        specs += [
            pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, 1, HALO, c), lambda bi, ti: (bi, ti, 0, 0)),
            pl.BlockSpec((1, 1, HALO, c), lambda bi, ti: (bi, ti, 0, 0)),
        ]
    if input_cond is not None:
        ip = padt(input_cond)
        inputs += [ip, *_halo_arrays(ip, tile)]
        specs += [
            pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, 1, HALO, c), lambda bi, ti: (bi, ti, 0, 0)),
            pl.BlockSpec((1, 1, HALO, c), lambda bi, ti: (bi, ti, 0, 0)),
        ]
    if film_gb is not None:
        inputs.append(film_gb)
        specs.append(pl.BlockSpec((1, 2 * c), lambda bi, ti: (bi, 0)))

    inputs += [jnp.asarray(alphas, jnp.float32).reshape(1, 3),
               w1.astype(cd), b1.astype(jnp.float32).reshape(1, -1),
               w2.astype(cd), b2.astype(jnp.float32).reshape(1, -1),
               w3.astype(cd), b3.astype(jnp.float32).reshape(1, -1)]
    specs += [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((5, c, c), lambda bi, ti: (0, 0, 0)),
        pl.BlockSpec((1, c), lambda bi, ti: (0, 0)),
        pl.BlockSpec((3, c, c), lambda bi, ti: (0, 0, 0)),
        pl.BlockSpec((1, c), lambda bi, ti: (0, 0)),
        pl.BlockSpec((3, c, c), lambda bi, ti: (0, 0, 0)),
        pl.BlockSpec((1, c), lambda bi, ti: (0, 0)),
    ]

    kernel = _make_kernel(tile, t, res is not None, input_cond is not None,
                          film_gb is not None, out_dtype)
    nt = tp // tile
    v_out, cond_out = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=specs,
        out_specs=[
            pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tp, c), out_dtype),
            jax.ShapeDtypeStruct((b, tp, c), out_dtype),
        ],
        interpret=interpret,
    )(*inputs)
    if t_pad:
        v_out = v_out[:, :t]
        cond_out = cond_out[:, :t]
    return v_out, cond_out
