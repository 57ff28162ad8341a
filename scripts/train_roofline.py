"""Roofline verdict for the one-jit GAN train step (PERF.md closure).

Compiles the production train step (batch/remat/dtype as flagged), pulls
XLA's own cost analysis (FLOPs + bytes accessed), measures the step, and
states the achieved fraction of (a) the XLA-achievable HBM bound
measured on THIS machine (419 GB/s, PERF.md platform calibration) and
(b) nominal v5e peaks (--peak-tflops/--peak-hbm-gbs), plus MFU.

    python scripts/train_roofline.py --bf16 --remat --batch=32 --seconds=2
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from open_universe_tpu.runtime import build_model, build_trainer, host_init
from open_universe_tpu.ops.conv import set_compute_dtype


def main():
    batch, seconds = 16, 4.0
    xla_bw_gbs = 419.0     # measured XLA elementwise ceiling (PERF.md)
    peak_tflops = 197.0    # v5e bf16 nominal
    peak_hbm_gbs = 819.0   # v5e nominal
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
        if a.startswith("--seconds="):
            seconds = float(a.split("=")[1])
        if a.startswith("--xla-bw="):
            xla_bw_gbs = float(a.split("=")[1])
    if "--bf16" in sys.argv:
        set_compute_dtype("bfloat16")
    if "--fold-cond" in sys.argv:
        from open_universe_tpu.models.universe.blocks import (
            set_fold_signal_cond,
        )
        set_fold_signal_cond(True)
        print("fold signal-cond: on", flush=True)

    t = int(16000 * seconds)
    model = build_model({"fs": 16000})
    tcfg = {"kind": "gan"}
    if "--remat" in sys.argv:
        tcfg["remat"] = True
    trainer = build_trainer(model, tcfg)
    state = host_init(trainer.init, jax.random.PRNGKey(0),
                      example_len=1600, batch=1)
    key = jax.random.PRNGKey(1)
    mix = jax.random.normal(key, (batch, t, 1)) * 0.05
    tgt = mix * 0.9

    def step(state, mix, tgt, key):
        new_state, metrics = trainer.train_step(state, (mix, tgt), key)
        return new_state, metrics["train/loss_gen"]

    jitted = jax.jit(step, donate_argnums=(0,))
    lowered = jitted.lower(state, mix, tgt, key)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0]
    flops = float(costs.get("flops", 0.0))
    bytes_acc = float(costs.get("bytes accessed", 0.0))

    # measure: donation consumes the state, so re-init per timing pass
    # would skew; instead loop by rebinding the returned state
    st = host_init(trainer.init, jax.random.PRNGKey(0),
                   example_len=1600, batch=1)
    st, loss = compiled(st, mix, tgt, key)
    float(loss)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        st, loss = compiled(st, mix, tgt, key)
        float(loss)
        best = min(best, time.perf_counter() - t0)

    audio_s = batch * seconds
    tf = flops / 1e12
    gb = bytes_acc / 1e9
    t_hbm_xla = bytes_acc / (xla_bw_gbs * 1e9)
    t_hbm_peak = bytes_acc / (peak_hbm_gbs * 1e9)
    t_mxu = flops / (peak_tflops * 1e12)
    print(f"batch={batch} seconds={seconds} -> {audio_s:.0f} audio-s/step")
    print(f"measured step: {best*1e3:.1f} ms = "
          f"{audio_s/best:.1f} audio-s/s/chip")
    print(f"XLA cost analysis: {tf:.2f} TFLOP, {gb:.2f} GB accessed")
    print(f"arithmetic intensity: {flops/max(bytes_acc,1):.1f} FLOP/byte "
          f"(ridge at {peak_tflops*1e12/(peak_hbm_gbs*1e9):.0f})")
    print(f"HBM-bound floor @ measured XLA bw ({xla_bw_gbs:.0f} GB/s): "
          f"{t_hbm_xla*1e3:.1f} ms -> step runs at "
          f"{100*t_hbm_xla/best:.0f}% of that bound")
    print(f"HBM-bound floor @ nominal {peak_hbm_gbs:.0f} GB/s: "
          f"{t_hbm_peak*1e3:.1f} ms -> {100*t_hbm_peak/best:.0f}%")
    print(f"MXU floor @ {peak_tflops:.0f} TF/s: {t_mxu*1e3:.1f} ms; "
          f"MFU = {100*t_mxu/best:.1f}%")


if __name__ == "__main__":
    main()
