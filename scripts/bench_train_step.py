"""Production-faithful GAN train-step throughput bench.

Unlike scripts/profile_train.py (which scans the step inside one jit and
cannot donate), this measures EXACTLY the production configuration from
``bin/train``: ``jax.jit(trainer.train_step, donate_argnums=(0,))`` —
donation releases the previous train state's buffers, which matters at
the HBM limit.  Prints ms/step and audio-s/s/chip.

    python scripts/bench_train_step.py --batch=64 --bf16 --remat --remat-disc
"""
import sys
import time

import jax
import jax.numpy as jnp

from open_universe_tpu.runtime import build_model, build_trainer, host_init


def main():
    batch = 32
    steps = 8
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
        if a.startswith("--steps="):
            steps = int(a.split("=")[1])
    if "--bf16" in sys.argv:
        from open_universe_tpu.ops.conv import set_compute_dtype
        set_compute_dtype("bfloat16")
    tcfg = {"kind": "gan"}
    if "--remat" in sys.argv:
        tcfg["remat"] = True
    if "--remat-disc" in sys.argv:
        tcfg["remat_disc"] = True
    print(f"batch={batch} cfg={tcfg} bf16={'--bf16' in sys.argv}",
          flush=True)

    model = build_model({"fs": 16000})
    trainer = build_trainer(model, tcfg)
    state = host_init(trainer.init, jax.random.PRNGKey(0),
                      example_len=1600, batch=1)
    state = jax.device_put(state)

    t = 64000
    key = jax.random.PRNGKey(1)
    mix = jax.random.normal(key, (batch, t, 1)) * 0.05
    tgt = mix * 0.9

    step_fn = jax.jit(trainer.train_step, donate_argnums=(0,))
    t0 = time.perf_counter()
    state, metrics = step_fn(state, (mix, tgt), key)
    float(metrics["train/loss_gen"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step_fn(state, (mix, tgt),
                                 jax.random.fold_in(key, i))
        # fetch each step like the production loop does at log points;
        # per-step fetch cost (~25 ms) is part of honest throughput
        float(metrics["train/loss_gen"])
    dt = (time.perf_counter() - t0) / steps
    audio = batch * 4.0 / dt
    print(f"{dt * 1e3:.1f} ms/step  {audio:.1f} audio-s/s/chip", flush=True)


if __name__ == "__main__":
    main()
