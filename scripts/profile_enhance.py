"""Break down UNIVERSE++ enhance() time on the real TPU chip.

Times (same in-jit-loop + scalar-fetch methodology as bench.py):
  - conditioner forward alone
  - conditioner + K score-network forwards
  - full 8-step enhance
so we can see which component dominates and whether the sampler matches
the sum of parts (1 conditioner + 8 score passes).
"""
import time

import jax
import jax.numpy as jnp

from open_universe_tpu.models.universe.model import UniverseConfig, UniverseModel
from open_universe_tpu.ops.conv import set_compute_dtype
from open_universe_tpu.ops.gru import set_use_pallas_gru


def timed(fn, *args, n_outer=3):
    float(fn(*args))  # compile + warmup
    best = float("inf")
    for _ in range(n_outer):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    set_compute_dtype("bfloat16")
    set_use_pallas_gru(True)
    import sys
    if "--fused-block" in sys.argv:
        from open_universe_tpu.ops.pallas_conv_block import (
            set_use_pallas_conv_block)
        set_use_pallas_conv_block(True)
        print("fused conv block: ON")

    fs = 16000
    batch = 128
    t = int(fs * 4.0)
    n_iter = 2

    model = UniverseModel(UniverseConfig())
    params = jax.device_put(
        model.init(jax.random.PRNGKey(0), example_len=1600, batch=1),
        jax.devices()[0])
    mix = jax.random.normal(jax.random.PRNGKey(1), (batch, t, 1)) * 0.05
    key = jax.random.PRNGKey(2)

    @jax.jit
    def full_enhance(params, mix, key):
        def body(c, i):
            out = model.enhance(params, mix[..., 0],
                                jax.random.fold_in(key, i))
            return c + out.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_iter))
        return acc

    def make_cond_score(n_score):
        @jax.jit
        def fn(params, mix, key):
            x_in, pad = model.pad(mix)

            def body(c, i):
                cond, y_est, _ = model.apply_cond(params, x_in)
                acc = y_est.astype(jnp.float32).sum()
                sigma = jnp.full((batch,), 0.1)
                x = x_in * (1.0 + 1e-6 * c)

                def sbody(c2, j):
                    s = model.apply_score_raw(params, x, sigma, cond)
                    return c2 + s.astype(jnp.float32).sum(), None
                acc2, _ = jax.lax.scan(sbody, jnp.zeros(()),
                                       jnp.arange(n_score)) \
                    if n_score else (jnp.zeros(()), None)
                return c + acc + acc2, None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_iter))
            return acc
        return fn

    audio_s = batch * 4.0 * n_iter

    t_full = timed(full_enhance, params, mix, key)
    print(f"full 8-step enhance : {t_full*1e3:9.1f} ms  "
          f"({audio_s/t_full:8.1f} audio-s/s)", flush=True)

    t_cond = timed(make_cond_score(0), params, mix, key)
    print(f"cond only (x{n_iter})     : {t_cond*1e3:9.1f} ms", flush=True)

    t_cs = timed(make_cond_score(8), params, mix, key)
    print(f"cond + 8 score (x{n_iter}): {t_cs*1e3:9.1f} ms", flush=True)

    per_cond = t_cond / n_iter
    per_score = (t_cs - t_cond) / (8 * n_iter)
    print(f"=> per cond fwd     : {per_cond*1e3:9.1f} ms")
    print(f"=> per score fwd    : {per_score*1e3:9.1f} ms")
    print(f"predicted full      : {(per_cond + 8*per_score)*n_iter*1e3:9.1f} ms"
          f" (vs measured {t_full*1e3:.1f}; rest = sampler arithmetic+norm)")


if __name__ == "__main__":
    main()
