"""fused_conv_stack vs unfused XLA stack at the L0 shape, on the TPU."""
import time

import jax
import jax.numpy as jnp

from open_universe_tpu.ops.conv import conv1d, _same_pads, prelu, set_compute_dtype
from open_universe_tpu.ops.film import film
from open_universe_tpu.ops.pallas_conv_block import fused_conv_stack

INV_SQRT2 = 0.7071067811865476


def timed(fn, *args, n_outer=3):
    float(fn(*args))
    best = float("inf")
    for _ in range(n_outer):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    set_compute_dtype("bfloat16")
    b, t, c = 128, 64160, 32
    n_inner = 4
    key = jax.random.PRNGKey(0)
    h = (jax.random.normal(key, (b, t, c)) * 0.1).astype(jnp.bfloat16)
    w1 = (jax.random.normal(key, (5, c, c)) * 0.1).astype(jnp.float32)
    w2 = (jax.random.normal(key, (3, c, c)) * 0.1).astype(jnp.float32)
    w3 = (jax.random.normal(key, (3, c, c)) * 0.1).astype(jnp.float32)
    b1 = b2 = b3 = jnp.zeros((c,), jnp.float32)
    gb = jnp.ones((b, 2 * c), jnp.float32)
    alphas = jnp.asarray([0.25, 0.25, 0.25], jnp.float32)

    @jax.jit
    def unfused(h, w1, w2, w3, gb):
        def body(x, i):
            cond = conv1d(prelu(x, 0.25).astype(jnp.bfloat16),
                          w1.astype(jnp.bfloat16), padding=_same_pads(5))
            y = film(cond, gb.astype(jnp.bfloat16))
            y = conv1d(prelu(y, 0.25), w2.astype(jnp.bfloat16),
                       padding=_same_pads(3))
            y = conv1d(prelu(y, 0.25), w3.astype(jnp.bfloat16),
                       padding=_same_pads(3))
            v = ((x + y) * INV_SQRT2).astype(jnp.bfloat16)
            return v, cond.astype(jnp.float32).sum()
        v, s = jax.lax.scan(body, h, jnp.arange(n_inner))
        return v.astype(jnp.float32).sum() + s.sum()

    @jax.jit
    def fused(h, w1, w2, w3, gb):
        def body(x, i):
            v, cond = fused_conv_stack(x, w1, b1, w2, b2, w3, b3, alphas,
                                       film_gb=gb)
            return v, cond.astype(jnp.float32).sum()
        v, s = jax.lax.scan(body, h, jnp.arange(n_inner))
        return v.astype(jnp.float32).sum() + s.sum()

    tu = timed(unfused, h, w1, w2, w3, gb) / n_inner
    tf = timed(fused, h, w1, w2, w3, gb) / n_inner
    print(f"unfused XLA stack : {tu*1e3:7.2f} ms/block")
    print(f"fused pallas      : {tf*1e3:7.2f} ms/block   ({tu/tf:.2f}x)")


if __name__ == "__main__":
    main()
