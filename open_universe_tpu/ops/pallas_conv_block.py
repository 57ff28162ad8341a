"""Pallas TPU kernel: fused UNIVERSE ConvBlock residual stack (packed).

The ConvBlock stack (reference blocks.py:234-416; ours
models/universe/blocks.py:ConvBlock) is, per block:

    h' = (h + res) / sqrt2                      [decoder only]
    cond_out = conv5(prelu(h')) + b1
    x = (cond_out + input_cond) / sqrt2         [decoder only]
    x = gamma * x + beta                        [film, optional]
    x = conv3(prelu(x)) + b2
    x = conv3(prelu(x)) + b3
    v_out = (h' + x) / sqrt2

Run through XLA this is ~8 HBM round-trips over the activation (convs
cannot fuse with each other); at the U-Net's high-resolution levels
(T=64k, C=32/64, batch 128 -> 0.5 GB activations in bf16) the stack is
purely HBM-bandwidth-bound. This kernel computes the whole stack in ONE
pass: read h (+res/+input_cond) once, write v_out and cond_out once.

**Packed (space-to-depth) interface.** TPU tiles the last two dims as
(8 sublanes, 128 lanes); a C=32 channels-last array would be padded 4x
in both HBM footprint and DMA bytes at a pallas_call boundary. So the
wrapper reshapes (B, T, C) -> (B, T/p, p*C) with p = 128/C (a pure
row-major reshape), making every block dense on the lane axis, and the
convs become frame-level convs with block-Toeplitz packed kernels:

    y[p f + j] = sum_k' x[p f + j + k' - lo] w[k']
    => Yf[f] = sum_d Xf[f + d] @ Wf[d],
       Wf[d][ji C + ci, jo C + co] = w[lo + ji + d p - jo][ci, co]

(d over +-floor((lo + p - 1)/p) frames). This is exact, and as a bonus
the p^2-fold larger frame matmuls run at full MXU lane utilization.

'same' conv semantics at the global signal boundary are preserved by
masking intermediate activations outside [0, T) (each conv zero-pads its
OWN input, so halo intermediates at the signal edges must be zeroed, not
computed from padded garbage). The grid may overhang T/p (edge-block
writes are masked by Pallas; garbage edge reads are zeroed by the same
mask), so no padding copies are ever made.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv import get_compute_dtype

INV_SQRT2 = 1.0 / np.sqrt(2.0)

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


def _pack_factor(t: int, c: int):
    """Packing factor p with p*C == 128 when legal, else 1."""
    if c < 128 and 128 % c == 0 and t % (128 // c) == 0:
        return 128 // c
    return 1


def fusion_profitable(t: int, c: int) -> bool:
    """Fuse only where the stack is HBM-bound: the high-resolution
    low-channel levels. At the bottleneck (C >= 256, short T) XLA's convs
    are fine and the packed interface does not apply."""
    if pallas_conv_block_interpret():
        return True  # CPU tests exercise the kernel on tiny shapes
    return c <= 64 and t >= 4096 and _pack_factor(t, c) > 1


def _frame_halo(k: int, p: int) -> int:
    """Frame taps on each side for a kernel-k same conv at pack p."""
    return ((k - 1) // 2 + p - 1) // p


def pack_stack_kernel(w, p: int):
    """(k, C, C) stride-1 same-pad conv kernel -> (2D+1, pC, pC) packed
    frame kernel (see module docstring). Exact; validated vs conv1d."""
    k, cin, cout = w.shape
    lo = (k - 1) // 2
    d2 = _frame_halo(k, p)
    taps = 2 * d2 + 1
    wp = jnp.zeros((taps, p * cin, p * cout), w.dtype)
    for m in range(taps):
        d = m - d2
        for ji in range(p):
            for jo in range(p):
                kp = lo + ji + d * p - jo
                if 0 <= kp < k:
                    wp = wp.at[m, ji * cin : (ji + 1) * cin,
                               jo * cout : (jo + 1) * cout].set(w[kp])
    return wp


def _conv_taps(x, w_ref, out_len: int):
    """Tap-shifted matmul conv: x (P, pC), w (D, pC, pC) -> (out_len, pC).

    y[j] = sum_i x[j + i] @ w[i]  (caller aligns offsets: the output's
    first row corresponds to input row (D-1)/2)."""
    k = w_ref.shape[0]
    xc = x.astype(w_ref.dtype)  # bf16 operands, f32 accumulation (MXU)
    acc = jnp.zeros((out_len, w_ref.shape[2]), jnp.float32)
    for i in range(k):
        acc += jnp.dot(xc[i : i + out_len], w_ref[i],
                       preferred_element_type=jnp.float32)
    return acc


def _prelu(x, alpha):
    # max/min formulation: identical to where(x>=0, x, alpha*x) but avoids
    # a bf16 cmpf, which Mosaic cannot lower on v5e
    zero = jnp.zeros((), x.dtype)
    return jnp.maximum(x, zero) + alpha * jnp.minimum(x, zero)


def _make_kernel(tile: int, f_true: int, d2a: int, d2b: int, d2c: int,
                 use_res: bool, use_ic: bool, use_film: bool, out_dtype):
    """tile/f_true in FRAMES; d2*: per-conv frame halos (hf = sum)."""
    hf = d2a + d2b + d2c

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

        # (tile + 2 hf, pC) window: frames [t0 - hf, t0 + tile + hf)
        h = jnp.concatenate([hl_ref[0, 0], h_ref[0], hr_ref[0, 0]], axis=0)
        if use_res:
            r = jnp.concatenate([rl_ref[0, 0], r_ref[0], rr_ref[0, 0]],
                                axis=0)
            h = (h + r) * jnp.asarray(INV_SQRT2, h.dtype)

        # global frame of each window row; zero rows outside [0, F)
        pos = t0 - hf + jax.lax.broadcasted_iota(
            jnp.int32, (tile + 2 * hf, 1), 0)
        valid = (pos >= 0) & (pos < f_true)
        h = jnp.where(valid, h, jnp.zeros((), h.dtype))

        a1 = _prelu(h, alpha_ref[0, 0])
        # y1 on window frames [d2a, tile + 2 hf - d2a)
        n1 = tile + 2 * (d2b + d2c)
        y1 = _conv_taps(a1, w1_ref, n1) + b1_ref[0][None, :]

        x = y1
        if use_ic:
            ic = jnp.concatenate(
                [icl_ref[0, 0], ic_ref[0], icr_ref[0, 0]], axis=0)
            x = (x + ic.astype(jnp.float32)[d2a : d2a + n1]) * INV_SQRT2
        if use_film:
            x = (gb_ref[0, 0, : x.shape[-1]].astype(jnp.float32)[None, :] * x
                 + gb_ref[0, 0, x.shape[-1] :].astype(jnp.float32)[None, :])

        # each conv same-pads its OWN input: zero rows outside [0, F)
        x = jnp.where(valid[d2a : d2a + n1], x, 0.0)
        a2 = _prelu(x, alpha_ref[0, 1])
        n2 = tile + 2 * d2c
        y2 = _conv_taps(a2, w2_ref, n2) + b2_ref[0][None, :]

        y2 = jnp.where(valid[d2a + d2b : d2a + d2b + n2], y2, 0.0)
        a3 = _prelu(y2, alpha_ref[0, 2])
        y3 = _conv_taps(a3, w3_ref, tile) + b3_ref[0][None, :]

        v = (h[hf : hf + tile].astype(jnp.float32) + y3) * INV_SQRT2
        vout_ref[0] = v.astype(out_dtype)
        cout_ref[0] = y1[d2b + d2c : d2b + d2c + tile].astype(out_dtype)

    return kernel


def _halo_arrays(x, tile: int, nt: int, hf: int):
    """Left/right hf-frame halos per tile: (B, nt, hf, pC) each."""
    b, f, pc = x.shape
    starts = jnp.arange(nt) * tile
    idx_l = starts[:, None] + jnp.arange(-hf, 0)[None, :]
    idx_r = starts[:, None] + tile + jnp.arange(hf)[None, :]
    ml = (idx_l >= 0) & (idx_l < f)
    mr = (idx_r >= 0) & (idx_r < f)
    hl = jnp.take(x, jnp.clip(idx_l, 0, f - 1).reshape(-1), axis=1)
    hr = jnp.take(x, jnp.clip(idx_r, 0, f - 1).reshape(-1), axis=1)
    hl = hl.reshape(b, nt, hf, pc) * ml[None, :, :, None].astype(x.dtype)
    hr = hr.reshape(b, nt, hf, pc) * mr[None, :, :, None].astype(x.dtype)
    return hl, hr


def fused_conv_stack(h, w1, b1, w2, b2, w3, b3, alphas,
                     film_gb=None, input_cond=None, res=None,
                     tile: int = 0, interpret: bool = False):
    """Fused ConvBlock residual stack. h (B, T, C) -> (v_out, cond_out).

    w1 (5, C, C), w2/w3 (3, C, C), b* (C,), alphas (3,) PReLU slopes,
    film_gb (B, 2C) optional, input_cond/res (B, T, C) optional.
    Exactly equivalent to the unfused XLA path (same-pad convs, torch
    PReLU semantics); matmul operands in the compute dtype with f32
    accumulation; outputs in the compute dtype.

    ``tile`` is in packed frames (0 = auto).
    """
    b, t, c = h.shape
    cd = get_compute_dtype()
    p = _pack_factor(t, c)
    f = t // p
    pc = p * c

    if tile == 0:
        tile = max(8, min(2048, f))
    nt = -(-f // tile)  # may overhang; edge blocks are masked

    d2a = _frame_halo(5, p)
    d2b = _frame_halo(3, p)
    d2c = _frame_halo(3, p)
    hf = d2a + d2b + d2c

    def prep(x):
        return x.astype(cd).reshape(b, f, pc)

    hp = prep(h)
    inputs = [hp, *_halo_arrays(hp, tile, nt, hf)]
    specs = [
        pl.BlockSpec((1, tile, pc), lambda bi, ti: (bi, ti, 0)),
        pl.BlockSpec((1, 1, hf, pc), lambda bi, ti: (bi, ti, 0, 0)),
        pl.BlockSpec((1, 1, hf, pc), lambda bi, ti: (bi, ti, 0, 0)),
    ]
    if res is not None:
        rp = prep(res)
        inputs += [rp, *_halo_arrays(rp, tile, nt, hf)]
        specs = specs + specs[:3]
    if input_cond is not None:
        ip = prep(input_cond)
        inputs += [ip, *_halo_arrays(ip, tile, nt, hf)]
        specs = specs + specs[:3]
    if film_gb is not None:
        # packed film: gamma/beta tiled p times to match packed columns;
        # leading length-1 axis keeps the block Mosaic-legal
        gamma, beta = film_gb[:, :c], film_gb[:, c:]
        gbp = jnp.concatenate([jnp.tile(gamma, (1, p)),
                               jnp.tile(beta, (1, p))], axis=-1)
        inputs.append(gbp[:, None, :])
        specs.append(pl.BlockSpec((1, 1, 2 * pc), lambda bi, ti: (bi, 0, 0)))

    w1p = pack_stack_kernel(w1, p).astype(cd)
    w2p = pack_stack_kernel(w2, p).astype(cd)
    w3p = pack_stack_kernel(w3, p).astype(cd)
    bias_tile = lambda bb: jnp.tile(bb.astype(jnp.float32), p).reshape(1, pc)
    inputs += [jnp.asarray(alphas, jnp.float32).reshape(1, 3),
               w1p, bias_tile(b1), w2p, bias_tile(b2), w3p, bias_tile(b3)]
    specs += [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(w1p.shape, lambda bi, ti: (0, 0, 0)),
        pl.BlockSpec((1, pc), lambda bi, ti: (0, 0)),
        pl.BlockSpec(w2p.shape, lambda bi, ti: (0, 0, 0)),
        pl.BlockSpec((1, pc), lambda bi, ti: (0, 0)),
        pl.BlockSpec(w3p.shape, lambda bi, ti: (0, 0, 0)),
        pl.BlockSpec((1, pc), lambda bi, ti: (0, 0)),
    ]

    kernel = _make_kernel(tile, f, d2a, d2b, d2c, res is not None,
                          input_cond is not None, film_gb is not None, cd)
    v_out, cond_out = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=specs,
        out_specs=[
            pl.BlockSpec((1, tile, pc), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, tile, pc), lambda bi, ti: (bi, ti, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, f, pc), cd),
            jax.ShapeDtypeStruct((b, f, pc), cd),
        ],
        interpret=interpret,
    )(*inputs)
    return v_out.reshape(b, t, c), cond_out.reshape(b, t, c)
