"""Isolate the non-network cost of enhance(): RNG, norm, pad, elementwise.

Hypothesis: threefry jax.random.normal over (128, 64160, 1) x 8 steps
dominates the gap between (cond + 8 score) time and full enhance time.
"""
import time

import jax
import jax.numpy as jnp


def timed(fn, *args, n_outer=3):
    float(fn(*args))
    best = float("inf")
    for _ in range(n_outer):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    shape = (128, 64160, 1)
    n_iter = 2

    @jax.jit
    def rng8(key):
        def body(c, i):
            k = jax.random.fold_in(key, i)
            def inner(c2, j):
                z = jax.random.normal(jax.random.fold_in(k, j), shape)
                return c2 + z.sum(), None
            acc, _ = jax.lax.scan(inner, jnp.zeros(()), jnp.arange(8))
            return c + acc, None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_iter))
        return acc

    @jax.jit
    def elementwise8(key, x):
        def body(c, i):
            def inner(x2, j):
                x2 = x2 + 0.01 * x2 * (j + 1.0) + 0.001
                return x2, None
            x2, _ = jax.lax.scan(inner, x * (1 + 1e-6 * c), jnp.arange(8))
            return c + x2.sum(), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_iter))
        return acc

    key = jax.random.PRNGKey(0)
    x = jnp.ones(shape)

    t = timed(rng8, key)
    print(f"8x random.normal{shape} x{n_iter} [threefry]: {t*1e3:8.1f} ms",
          flush=True)

    t = timed(elementwise8, key, x)
    print(f"8x elementwise   {shape} x{n_iter}          : {t*1e3:8.1f} ms",
          flush=True)

    with jax.default_prng_impl("rbg"):
        @jax.jit
        def rng8_rbg(key):
            def body(c, i):
                k = jax.random.fold_in(key, i)
                def inner(c2, j):
                    z = jax.random.normal(jax.random.fold_in(k, j), shape)
                    return c2 + z.sum(), None
                acc, _ = jax.lax.scan(inner, jnp.zeros(()), jnp.arange(8))
                return c + acc, None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_iter))
            return acc

        key_rbg = jax.random.PRNGKey(0)
        t = timed(rng8_rbg, key_rbg)
        print(f"8x random.normal{shape} x{n_iter} [rbg]     : {t*1e3:8.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
