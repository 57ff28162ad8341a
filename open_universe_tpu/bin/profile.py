"""First-class profiling: trace capture + speed-of-light accounting.

The reference ships no profiling at all (SURVEY.md §5: Lightning's
profiler is off; no torch.profiler, no NVTX). On TPU the two numbers
that matter are (1) where the step time goes (the trace) and (2) how far
from the hardware ceiling each program runs (speed-of-light accounting).
This tool provides both for any config:

    python -m open_universe_tpu.bin.profile --config <yaml> \
        [--mode train|enhance] [--steps 5] [--batch 8] \
        [--trace-dir out/trace] [--peak-tflops 197 --peak-hbm-gbs 819]

- Times the jit'ed program exactly as production runs it (donated train
  state / jitted ``enhance``), with the loop-in-jit + scalar-fetch
  barrier that works over remote-tunnel TPUs (PERF.md methodology).
- Pulls XLA's own ``cost_analysis`` (FLOPs + bytes accessed) from the
  compiled executable and prints the roofline floors: time at peak MXU
  rate, time at peak HBM bandwidth, and the attained fraction of
  whichever bound dominates. Defaults are TPU v5e peaks (197 bf16
  TFLOP/s, 819 GB/s); pass your chip's numbers for other hardware.
- ``--trace-dir`` wraps the timed steps in ``jax.profiler.trace`` — the
  output loads in TensorBoard / Perfetto for per-kernel timelines
  (degrades gracefully where the backend cannot trace, e.g. some
  remote tunnels).
"""
import argparse
import json
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default=None,
                        help="experiment yaml; omit for the default "
                        "UNIVERSE++ 16k model")
    parser.add_argument("--mode", default="train",
                        choices=["train", "enhance"])
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--audio-len", type=float, default=4.0)
    parser.add_argument("--trace-dir", default=None)
    parser.add_argument("--peak-tflops", type=float, default=197.0,
                        help="bf16 peak of the chip (v5e default)")
    parser.add_argument("--peak-hbm-gbs", type=float, default=819.0)
    parser.add_argument("overrides", nargs="*", default=[])
    args = parser.parse_args(argv)

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from ..runtime import build_model, build_trainer, host_init

    if args.config:
        from ..config import load_config
        cfg = load_config(args.config, args.overrides)
        model_cfg, trainer_cfg = cfg["model"], cfg["trainer"]
        batch = args.batch or cfg["datamodule"].get("batch_size", 8)
    else:
        model_cfg, trainer_cfg = {"fs": 16000}, {"kind": "gan", "remat": True}
        batch = args.batch or 8

    on_accel = jax.default_backend() not in ("cpu",)
    if on_accel:
        from ..ops.conv import set_compute_dtype
        set_compute_dtype("bfloat16")

    model = build_model(model_cfg)
    trainer = build_trainer(model, trainer_cfg)
    t = int(model.cfg.fs * args.audio_len)
    t -= t % model.tot_ds
    key = jax.random.PRNGKey(0)
    mix = jax.random.normal(key, (batch, t, 1)) * 0.05
    tgt = mix * 0.9
    t_compile0 = time.perf_counter()

    if args.mode == "train":
        state = host_init(trainer.init, key, example_len=model.tot_ds * 10,
                          batch=1)
        state = jax.device_put(state)
        fn = jax.jit(trainer.train_step, donate_argnums=(0,))
        compiled = fn.lower(state, (mix, tgt), key).compile()

        def run_step(i):
            nonlocal state
            state, m = compiled(state, (mix, tgt), jax.random.fold_in(key, i))
            return m["train/loss_gen"]
    else:
        params = model.init(key, example_len=model.tot_ds * 10, batch=1)
        params = jax.device_put(params)
        fn = jax.jit(lambda p, x, k: model.enhance(p, x, k))
        compiled = fn.lower(params, mix[..., 0], key).compile()

        def run_step(i):
            return compiled(params, mix[..., 0],
                            jax.random.fold_in(key, i))[0, 0]
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns one dict per device
        costs = costs[0] if costs else {}
    flops = float(costs.get("flops", 0.0))
    bytes_acc = float(costs.get("bytes accessed", 0.0))

    compile_s = time.perf_counter() - t_compile0
    float(run_step(0))  # warmup

    ctx = None
    if args.trace_dir:
        try:
            ctx = jax.profiler.trace(args.trace_dir)
            ctx.__enter__()
        except Exception as e:  # tracing unsupported on some backends
            print(f"# trace capture unavailable: {e}", flush=True)
            ctx = None
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(args.steps):
        acc = run_step(i + 1)
    acc = float(acc)  # scalar fetch: the only reliable barrier (PERF.md)
    dt = (time.perf_counter() - t0) / args.steps
    if ctx is not None:
        ctx.__exit__(None, None, None)
        print(f"# trace written to {args.trace_dir} "
              f"(load in TensorBoard / Perfetto)", flush=True)

    t_mxu = flops / (args.peak_tflops * 1e12)
    t_hbm = bytes_acc / (args.peak_hbm_gbs * 1e9)
    floor = max(t_mxu, t_hbm)
    bound = "MXU" if t_mxu >= t_hbm else "HBM"
    out = {
        "mode": args.mode, "batch": batch, "audio_len_s": args.audio_len,
        "ms_per_step": round(dt * 1e3, 2),
        "audio_s_per_s": round(batch * args.audio_len / dt, 1),
        "compile_s": round(compile_s, 1),
        "xla_gflops_per_step": round(flops / 1e9, 1),
        "xla_gbytes_per_step": round(bytes_acc / 1e9, 2),
        "sol_floor_ms": round(floor * 1e3, 2),
        "sol_bound": bound,
        "sol_attained_frac": round(floor / dt, 3) if dt > 0 else None,
        "mxu_floor_ms": round(t_mxu * 1e3, 2),
        "hbm_floor_ms": round(t_hbm * 1e3, 2),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
