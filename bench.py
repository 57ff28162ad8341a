"""Benchmark: UNIVERSE++ 8-step enhancement throughput on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Timing methodology (IMPORTANT for this environment): over the axon tunnel
``block_until_ready`` does NOT synchronize device execution, so the
iteration loop runs INSIDE one jit (lax.scan) and a scalar is fetched to
host — the fetch is the only reliable completion barrier. Dispatch+fetch
overhead (~40 ms) is amortized over enough iterations to be <2% of the
measurement.

The reference publishes no throughput numbers (BASELINE.md) — the
conventional baseline is 1x realtime (value == audio-seconds processed
per wall-clock second per chip, so vs_baseline == value).
"""
import json
import sys
import time


def run_once():
    import jax
    import jax.numpy as jnp

    from open_universe_tpu.models.universe.model import (
        UniverseConfig,
        UniverseModel,
    )

    from open_universe_tpu.ops.conv import set_compute_dtype

    fs = 16000
    batch = 128          # throughput plateaus at 128 (== 256) on one chip
    seconds = 4.0
    t = int(fs * seconds)
    n_iter = 2

    # production serving precision: bf16 compute + bf16-stored params,
    # f32 sampler state (quality-verified: corr 1.000000 with f32 output);
    # fused Pallas GRU recurrence for the bottlenecks (~2.5% end-to-end)
    set_compute_dtype("bfloat16")
    from open_universe_tpu.ops.gru import set_use_pallas_gru
    from open_universe_tpu.runtime import host_init
    model = UniverseModel(UniverseConfig())
    params = host_init(model.init, jax.random.PRNGKey(0), example_len=1600,
                       batch=1)
    # bf16-stored params: the enhance path is HBM-bound and reads the full
    # weight set once per score call (8x per batch); storing bf16 halves
    # that traffic: +10% measured, output corr 1.000000 vs f32 storage
    # (scripts/bench_bf16_params.py; PERF.md)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    set_use_pallas_gru(True)  # after init: no TPU kernel in the CPU trace

    @jax.jit
    def bench_fn(params, mix, key):
        def body(carry, i):
            out = model.enhance(params, mix, jax.random.fold_in(key, i))
            return carry + out.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_iter))
        return acc

    mix = jax.random.normal(jax.random.PRNGKey(1), (batch, t)) * 0.05
    key = jax.random.PRNGKey(2)

    float(bench_fn(params, mix, key))  # compile + warmup (fetch = barrier)

    start = time.perf_counter()
    float(bench_fn(params, mix, key))
    elapsed = time.perf_counter() - start

    audio_s = batch * seconds * n_iter
    return audio_s / elapsed


def main():
    last_err = None
    for attempt in range(3):
        try:
            throughput = run_once()
            break
        except Exception as e:  # remote-compile tunnel can flake
            last_err = e
            time.sleep(5)
    else:
        print(json.dumps({"metric": "enhance_throughput_16k_8step",
                          "value": 0.0, "unit": "audio_s_per_s_per_chip",
                          "vs_baseline": 0.0,
                          "error": str(last_err)[:200]}))
        return

    print(json.dumps({
        "metric": "enhance_throughput_16k_8step",
        "value": round(throughput, 2),
        "unit": "audio_s_per_s_per_chip",
        "vs_baseline": round(throughput, 2),
    }))


if __name__ == "__main__":
    main()
