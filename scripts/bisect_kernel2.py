"""Map pallas per-grid-step overhead: copy kernel at varying block sizes."""
import time

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
N_INNER = 4


def k_copy(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def run(bs, tile):
    ntb = B // bs
    ntf = -(-F // tile)
    call = pl.pallas_call(
        k_copy,
        grid=(ntb, ntf),
        in_specs=[pl.BlockSpec((bs, tile, PC), lambda bi, ti: (bi, ti, 0))],
        out_specs=pl.BlockSpec((bs, tile, PC), lambda bi, ti: (bi, ti, 0)),
        out_shape=jax.ShapeDtypeStruct((B, F, PC), jnp.bfloat16),
    )

    @jax.jit
    def bench(x):
        def body(h, i):
            return call(h), None
        h, _ = jax.lax.scan(body, x, jnp.arange(N_INNER))
        return h.astype(jnp.float32).sum()

    x = jnp.ones((B, F, PC), jnp.bfloat16)
    dt = timed(bench, x) / N_INNER
    gb = 2 * B * F * PC * 2 / 1e9
    progs = ntb * ntf
    print(f"bs={bs:3d} tile={tile:5d} progs={progs:5d}: {dt*1e3:7.2f} ms "
          f"({gb/dt:5.0f} GB/s, {dt/progs*1e6:5.1f} us/prog)", flush=True)


def main():
    for bs, tile in [(1, 2048), (1, 8192), (4, 2048), (8, 2048), (8, 4096),
                     (16, 2048), (32, 1024)]:
        run(bs, tile)


if __name__ == "__main__":
    main()
