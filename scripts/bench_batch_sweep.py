"""Throughput vs batch size with bench.py methodology (bf16, pallas GRU)."""
import time

import jax
import jax.numpy as jnp

from open_universe_tpu.models.universe.model import UniverseConfig, UniverseModel
from open_universe_tpu.ops.conv import set_compute_dtype
from open_universe_tpu.ops.gru import set_use_pallas_gru


def main():
    set_compute_dtype("bfloat16")
    fs = 16000
    t = 64000
    n_iter = 2
    model = UniverseModel(UniverseConfig())
    from open_universe_tpu.runtime import host_init
    params = host_init(model.init, jax.random.PRNGKey(0), example_len=1600,
                       batch=1)
    set_use_pallas_gru(True)
    key = jax.random.PRNGKey(2)

    for batch in (8, 16, 32, 64, 128):
        @jax.jit
        def bench_fn(params, mix, key):
            def body(carry, i):
                out = model.enhance(params, mix, jax.random.fold_in(key, i))
                return carry + out.astype(jnp.float32).sum(), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_iter))
            return acc

        mix = jax.random.normal(jax.random.PRNGKey(1), (batch, t)) * 0.05
        float(bench_fn(params, mix, key))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(bench_fn(params, mix, key))
            best = min(best, time.perf_counter() - t0)
        audio_s = batch * (t / fs) * n_iter
        print(f"batch={batch:4d}: {best*1e3:8.1f} ms  "
              f"{audio_s/best:7.1f} audio-s/s", flush=True)


if __name__ == "__main__":
    main()
