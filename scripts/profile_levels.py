"""Per-level timing of the score U-Net's conv blocks + GRU on the TPU.

Times one ConvBlock("down") at each encoder level's (T, C) and the
bottleneck BiGRU, batch 128 bf16, to locate the hot levels.
"""
import time

import jax
import jax.numpy as jnp

from open_universe_tpu.models.universe.blocks import ConvBlock
from open_universe_tpu.ops.conv import set_compute_dtype
from open_universe_tpu.ops.gru import GRU, set_use_pallas_gru


def timed(fn, *args, n_outer=3):
    float(fn(*args))
    best = float("inf")
    for _ in range(n_outer):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_block(batch, t, c, r, n_inner=4):
    block = ConvBlock(c, r, "down")
    x = jnp.ones((batch, t, c))
    nc = jnp.ones((batch, 2 * c * 2))  # film cond (2*next_c) — shape per usage
    key = jax.random.PRNGKey(0)
    params = block.init(key, x, noise_cond=None)

    @jax.jit
    def run(params, x):
        def body(h, i):
            out, res, _ = block.apply(params, h * (1 + 1e-6 * i),
                                      noise_cond=None)
            # out has different (T, C); fold a scalar back into h to keep
            # the loop sequential without shape change
            return h + out.sum() * 1e-20, (out.sum(), res.sum())
        h, (a, b) = jax.lax.scan(body, x, jnp.arange(n_inner))
        return a.sum() + b.sum()

    dt = timed(run, params, x) / n_inner
    return dt


def bench_gru(batch, t, c, n_inner=4):
    gru = GRU(hidden_size=c // 2, bidirectional=True)
    x = jnp.ones((batch, t, c))
    params = gru.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def run(params, x):
        def body(h, i):
            out = gru.apply(params, h * (1 + 1e-6 * i))
            return h + out.sum() * 1e-20, out.sum()
        h, a = jax.lax.scan(body, x, jnp.arange(n_inner))
        return a.sum()

    return timed(run, params, x) / n_inner


def main():
    set_compute_dtype("bfloat16")
    set_use_pallas_gru(True)
    batch = 128
    levels = [
        (64160, 32, 2),
        (32080, 64, 4),
        (8020, 128, 4),
        (2005, 256, 5),
    ]
    total = 0.0
    for t, c, r in levels:
        dt = bench_block(batch, t, c, r)
        total += dt
        print(f"ConvBlock down T={t:6d} C={c:4d} r={r}: {dt*1e3:7.2f} ms",
              flush=True)
    dt = bench_block(batch, 401, 512, None)
    total += dt
    print(f"ConvBlock extra T=  401 C= 512    : {dt*1e3:7.2f} ms", flush=True)
    dt = bench_gru(batch, 401, 512)
    total += dt
    print(f"BiGRU           T=  401 C= 512    : {dt*1e3:7.2f} ms", flush=True)
    print(f"sum (encoder side only)           : {total*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
