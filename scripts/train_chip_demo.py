"""Full-size GAN training demo on the real chip (bf16 + remat, batch 32).

Runs the UNIVERSE++ trainer at production shapes on synthetic tone
denoising for a few hundred steps: proves the optimized one-jit GAN step
is numerically healthy in bf16 (no NaN, losses move the right way) and
reports steady-state steps/s including host->device batch transfer.

Run: PYTHONPATH=.:/root/.axon_site python scripts/train_chip_demo.py
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from open_universe_tpu.ops.conv import set_compute_dtype
from open_universe_tpu.runtime import build_model, build_trainer


def make_batch(rng, batch, t, fs):
    tt = np.arange(t) / fs
    f0 = rng.uniform(100.0, 400.0, (batch, 3, 1))
    amp = rng.uniform(0.1, 1.0, (batch, 3, 1))
    ph = rng.uniform(0, 2 * np.pi, (batch, 3, 1))
    clean = (amp * np.sin(2 * np.pi * f0 * tt[None, None, :] + ph)).sum(1)
    clean = clean / np.abs(clean).max(-1, keepdims=True) * 0.3
    noisy = clean + rng.standard_normal((batch, t)) * 0.05
    return (jnp.asarray(noisy[..., None], jnp.float32),
            jnp.asarray(clean[..., None], jnp.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    set_compute_dtype("bfloat16")
    fs, t = 16000, 64000
    model = build_model({"fs": fs})
    trainer = build_trainer(model, {"kind": "gan", "remat": True,
                                    "t_warmup": 50, "t_cosine": 10000,
                                    "t_max": 20000})
    from open_universe_tpu.runtime import host_init
    state = host_init(trainer.init, jax.random.PRNGKey(0), example_len=1600,
                      batch=1)
    step_fn = jax.jit(trainer.train_step, donate_argnums=(0,))

    if args.steps < 6:
        raise SystemExit("--steps must be >= 6 (timing starts at step 5)")
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    hist = []
    t_start = None
    for i in range(args.steps):
        mix, clean = make_batch(rng, args.batch, t, fs)
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, (mix, clean), k)
        if i == 0:
            jax.block_until_ready(metrics["train/loss_gen"])
        if i == 4:
            # timing starts after warmup/compile
            float(metrics["train/loss_gen"])
            t_start = time.perf_counter()
            n_timed0 = i
        if (i + 1) % 25 == 0 or i == 0:
            m = {k2: float(v) for k2, v in metrics.items()}
            hist.append(m)
            assert np.isfinite(m["train/loss_gen"]), m
            assert np.isfinite(m["train/loss_disc"]), m
            print(f"[{i+1}] gen={m['train/loss_gen']:.3f} "
                  f"disc={m['train/loss_disc']:.3f} "
                  f"score={m['train/score']:.4f} "
                  f"mel={m['train/signal_mel']:.4f}", flush=True)
    float(metrics["train/loss_gen"])
    dt = time.perf_counter() - t_start
    n = args.steps - 1 - n_timed0
    sps = n / dt
    print(f"steady-state: {sps:.3f} steps/s = "
          f"{sps * args.batch * (t / fs):.1f} audio-s/s/chip "
          f"(incl. host batch gen + H2D)", flush=True)
    first, last = hist[0], hist[-1]
    print(f"score loss {first['train/score']:.4f} -> {last['train/score']:.4f}"
          f"; mel {first['train/signal_mel']:.4f} -> "
          f"{last['train/signal_mel']:.4f}", flush=True)


if __name__ == "__main__":
    main()
