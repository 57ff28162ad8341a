"""Experiment: bf16-stored params for enhance() — throughput + quality.

The enhance path is HBM-bound (PERF.md); weights are read from HBM once
per score call (8x per utterance batch). Storing them bf16 halves that
traffic. This measures end-to-end throughput vs f32-stored params and the
output correlation (quality proxy used for the bf16-compute decision).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from open_universe_tpu.models.universe.model import UniverseConfig, UniverseModel
from open_universe_tpu.ops.conv import set_compute_dtype
from open_universe_tpu.ops.gru import set_use_pallas_gru
from open_universe_tpu.runtime import host_init

fs = 16000
batch = 128
t = int(fs * 4.0)
n_iter = 2

set_compute_dtype("bfloat16")
model = UniverseModel(UniverseConfig())
params = host_init(model.init, jax.random.PRNGKey(0), example_len=1600,
                   batch=1)
set_use_pallas_gru(True)

mix = jax.random.normal(jax.random.PRNGKey(1), (batch, t)) * 0.05
key = jax.random.PRNGKey(2)


def bench(params, tag):
    @jax.jit
    def fn(params, mix, key):
        def body(carry, i):
            out = model.enhance(params, mix, jax.random.fold_in(key, i))
            return carry + out.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_iter))
        return acc

    float(fn(params, mix, key))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(params, mix, key))
        best = min(best, time.perf_counter() - t0)
    thr = batch * 4.0 * n_iter / best
    print(f"{tag}: {best*1e3:.1f} ms -> {thr:.1f} audio-s/s/chip", flush=True)
    return thr


@jax.jit
def one(params, mix, key):
    return model.enhance(params, mix, key)


out_f32 = np.asarray(one(params, mix[:8], key)).ravel()

params_bf16 = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
out_bf16 = np.asarray(one(params_bf16, mix[:8], key).astype(jnp.float32)).ravel()
corr = np.corrcoef(out_f32, out_bf16)[0, 1]
print(f"corr(f32-params, bf16-params) = {corr:.6f}", flush=True)

thr32 = bench(params, "f32 params")
thr16 = bench(params_bf16, "bf16 params")
print(f"speedup: {thr16/thr32:.3f}x", flush=True)
