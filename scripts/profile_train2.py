"""Sanity: compare enhance-path vs train-path component times at equal batch."""
import sys
import time

import jax
import jax.numpy as jnp

from open_universe_tpu.models.universe.model import UniverseConfig, UniverseModel
from open_universe_tpu.ops.conv import set_compute_dtype


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
    batch = 16
    t = 64000
    n_inner = 2
    model = UniverseModel(UniverseConfig())
    from open_universe_tpu.runtime import host_init
    params = host_init(model.init, jax.random.PRNGKey(0), example_len=1600,
                       batch=1)
    mix = jax.random.normal(jax.random.PRNGKey(1), (batch, t, 1)) * 0.05
    tgt = mix * 0.9
    key = jax.random.PRNGKey(2)

    @jax.jit
    def enh(params, mix, key):
        def body(c, i):
            out = model.enhance(params, mix[..., 0],
                                jax.random.fold_in(key, i))
            return c + out.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_inner))
        return acc

    @jax.jit
    def cond_only(params, mix):
        def body(c, i):
            cond, y_raw, _ = model.apply_cond(params, mix * (1 + 1e-6 * c),
                                              x_wav=mix)
            return (c + sum(v.astype(jnp.float32).sum() for v in cond)
                    + y_raw.astype(jnp.float32).sum()), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_inner))
        return acc

    @jax.jit
    def score_only(params, mix, tgt):
        cond, y_raw, _ = model.apply_cond(params, mix, x_wav=mix)
        def body(c, i):
            sigma = jnp.full((batch,), 0.1)
            x_t = tgt + sigma[:, None, None] * (1 + 1e-6 * c)
            s = model.score_fn(params)(x_t, sigma, cond)
            return c + s.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_inner))
        return acc

    for name, fn, args in [
        ("enhance x2", enh, (params, mix, key)),
        ("cond x2", cond_only, (params, mix)),
        ("cond + score x2", score_only, (params, mix, tgt)),
    ]:
        dt = timed(fn, *args)
        print(f"{name:>18}: {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
