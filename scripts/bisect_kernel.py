"""Bisect the fused-block kernel cost: copy-only -> +halo -> +matmuls."""
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def timed(fn, *args, n_outer=3):
    float(fn(*args))
    best = float("inf")
    for _ in range(n_outer):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


B, F, PC = 128, 16040, 128
TILE = 2048
NT = -(-F // TILE)
HF = 3
N_INNER = 4


def run_variant(name, kernel, n_out, with_halo, with_w, x, hl, hr, w):
    specs = [pl.BlockSpec((1, TILE, PC), lambda bi, ti: (bi, ti, 0))]
    inputs = [x]
    if with_halo:
        specs += [pl.BlockSpec((1, 1, HF, PC), lambda bi, ti: (bi, ti, 0, 0))] * 2
        inputs += [hl, hr]
    if with_w:
        specs += [pl.BlockSpec((9, PC, PC), lambda bi, ti: (0, 0, 0))]
        inputs += [w]

    call = pl.pallas_call(
        kernel,
        grid=(B, NT),
        in_specs=specs,
        out_specs=[pl.BlockSpec((1, TILE, PC),
                                lambda bi, ti: (bi, ti, 0))] * n_out,
        out_shape=[jax.ShapeDtypeStruct((B, F, PC), jnp.bfloat16)] * n_out,
    )

    @jax.jit
    def bench(x, *rest):
        def body(h, i):
            outs = call(h, *rest)
            out = outs[0] if n_out > 1 else outs[0]
            return out, sum(o.astype(jnp.float32).sum() for o in outs[1:])
        h, s = jax.lax.scan(body, x, jnp.arange(N_INNER))
        return h.astype(jnp.float32).sum() + (s.sum() if n_out > 1 else 0.0)

    dt = timed(bench, *inputs) / N_INNER
    gb = (1 + n_out) * B * F * PC * 2 / 1e9
    print(f"{name:28s}: {dt*1e3:7.2f} ms  ({gb/dt:5.0f} GB/s)", flush=True)


def k_copy1(x_ref, o_ref):
    o_ref[0] = x_ref[0]


def k_copy2(x_ref, o1_ref, o2_ref):
    o1_ref[0] = x_ref[0]
    o2_ref[0] = x_ref[0]


def k_halo2(x_ref, hl_ref, hr_ref, o1_ref, o2_ref):
    w = jnp.concatenate([hl_ref[0, 0], x_ref[0], hr_ref[0, 0]], axis=0)
    o1_ref[0] = w[HF : HF + TILE]
    o2_ref[0] = w[HF - 1 : HF - 1 + TILE]


def k_mm(x_ref, hl_ref, hr_ref, w_ref, o1_ref, o2_ref):
    win = jnp.concatenate([hl_ref[0, 0], x_ref[0], hr_ref[0, 0]], axis=0)
    acc = jnp.zeros((TILE, PC), jnp.float32)
    for i in range(9):
        s = i % 3
        acc += jnp.dot(win[s : s + TILE], w_ref[i],
                       preferred_element_type=jnp.float32)
    o1_ref[0] = acc.astype(jnp.bfloat16)
    o2_ref[0] = win[HF : HF + TILE]


def k_mm_chain(x_ref, hl_ref, hr_ref, w_ref, o1_ref, o2_ref):
    win = jnp.concatenate([hl_ref[0, 0], x_ref[0], hr_ref[0, 0]], axis=0)
    y = win.astype(jnp.float32)
    # three chained 3-tap convs like the real kernel
    n = TILE + 4
    y1 = jnp.zeros((n, PC), jnp.float32)
    for i in range(3):
        y1 += jnp.dot(win[i : i + n].astype(jnp.bfloat16), w_ref[i],
                      preferred_element_type=jnp.float32)
    n2 = TILE + 2
    y2 = jnp.zeros((n2, PC), jnp.float32)
    for i in range(3):
        y2 += jnp.dot(y1[i : i + n2].astype(jnp.bfloat16), w_ref[3 + i],
                      preferred_element_type=jnp.float32)
    y3 = jnp.zeros((TILE, PC), jnp.float32)
    for i in range(3):
        y3 += jnp.dot(y2[i : i + TILE].astype(jnp.bfloat16), w_ref[6 + i],
                      preferred_element_type=jnp.float32)
    o1_ref[0] = y3.astype(jnp.bfloat16)
    o2_ref[0] = y1[2 : 2 + TILE].astype(jnp.bfloat16)


def main():
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (B, F, PC)) * 0.1).astype(jnp.bfloat16)
    hl = jnp.zeros((B, NT, HF, PC), jnp.bfloat16)
    hr = jnp.zeros((B, NT, HF, PC), jnp.bfloat16)
    w = (jax.random.normal(key, (9, PC, PC)) * 0.05).astype(jnp.bfloat16)

    run_variant("copy 1-out", k_copy1, 1, False, False, x, hl, hr, w)
    run_variant("copy 2-out", k_copy2, 2, False, False, x, hl, hr, w)
    run_variant("halo concat 2-out", k_halo2, 2, True, False, x, hl, hr, w)
    run_variant("9 parallel matmuls", k_mm, 2, True, True, x, hl, hr, w)
    run_variant("3x3 chained matmuls", k_mm_chain, 2, True, True, x, hl, hr, w)


if __name__ == "__main__":
    main()
