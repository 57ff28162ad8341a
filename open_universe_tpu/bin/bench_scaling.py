"""Data-parallel scaling-efficiency benchmark.

Usage:
    python -m open_universe_tpu.bin.bench_scaling [--sizes 1 2 4 8]
        [--batch-per-device 8] [--audio-len 4.0] [--steps 4] [--tiny]

Times the jit'ed train step on a ``data`` mesh of each requested size
(weak scaling: per-device batch held constant) and prints one JSON line
per size with audio-seconds/s and parallel efficiency vs the 1-device
run. The reference has no analogue (its only scaling story is Lightning
DDP with no measurement harness; SURVEY.md §2.8/§6).

On CPU (e.g. XLA_FLAGS=--xla_force_host_platform_device_count=8 for a
virtual mesh) pass --tiny to use a small model so compiles stay fast.
"""
import argparse
import json
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--sizes", type=int, nargs="*", default=None)
    parser.add_argument("--batch-per-device", type=int, default=8)
    parser.add_argument("--audio-len", type=float, default=4.0)
    parser.add_argument("--steps", type=int, default=4)
    parser.add_argument("--kind", default="gan", choices=["gan", "mdn"])
    parser.add_argument("--mode", default="train",
                        choices=["train", "enhance"],
                        help="enhance: data-parallel SERVING scaling — "
                        "the 8-step sampler batch sharded over the mesh "
                        "(the multi-chip path of "
                        "inference/streaming.py:enhance_streaming_sharded)")
    parser.add_argument("--tiny", action="store_true",
                        help="small model (CPU validation)")
    args = parser.parse_args(argv)

    import os

    import jax

    # the axon sitecustomize pins jax_platforms=axon at interpreter start;
    # an explicit JAX_PLATFORMS from the user (e.g. =cpu for a virtual
    # mesh with XLA_FLAGS=--xla_force_host_platform_device_count=N) must
    # still win — the config update is what actually takes effect.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from ..parallel import default_mesh, make_parallel_train_step
    from ..runtime import build_model, build_trainer

    n_dev = len(jax.devices())
    sizes = args.sizes or [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]

    if args.tiny:
        model_cfg = {"fs": 800, "rate_factors": [2, 4], "n_channels": 4,
                     "n_rff": 8, "noise_cond_dim": 32, "n_mels": 8,
                     "diffusion": {"n_steps": 4}}
        trainer_cfg = ({"kind": "gan", "mpd_periods": [2, 3],
                        "mrd_resolutions": [[64, 16, 32]]}
                       if args.kind == "gan" else {"kind": "mdn"})
    else:
        model_cfg = {"fs": 16000}
        trainer_cfg = {"kind": args.kind}
    model = build_model(model_cfg)
    trainer = build_trainer(model, trainer_cfg)
    t = int(model.cfg.fs * args.audio_len)
    t -= t % model.tot_ds

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    import contextlib
    with (jax.default_device(cpu) if cpu is not None
          else contextlib.nullcontext()):
        if args.kind == "mdn":
            state0 = trainer.init(jax.random.PRNGKey(0),
                                  batch=args.batch_per_device)
        else:
            state0 = trainer.init(jax.random.PRNGKey(0),
                                  example_len=model.tot_ds * 10, batch=1)

    base = None
    for n in sizes:
        mesh = default_mesh(n)
        batch = args.batch_per_device * n
        mix = jax.random.normal(jax.random.PRNGKey(1), (batch, t, 1)) * 0.05
        key = jax.random.PRNGKey(2)
        if args.mode == "enhance":
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            bsh = NamedSharding(mesh, P("data", None))
            params = {k: gp for k, gp in (
                state0.gen_params.items() if hasattr(state0, "gen_params")
                else state0.params.items())}
            params = jax.device_put(jax.device_get(params),
                                    jax.tree_util.tree_map(
                                        lambda _: repl, params))
            fn = jax.jit(lambda p, m, k: model.enhance(p, m, k),
                         in_shardings=(jax.tree_util.tree_map(
                             lambda _: repl, params), bsh, repl))
            x = jax.device_put(mix[..., 0], bsh)
            float(fn(params, x, key)[0, 0])  # warmup/compile
            t0 = time.perf_counter()
            for i in range(args.steps):
                out = fn(params, x, jax.random.fold_in(key, i))
            float(out[0, 0])
            dt = time.perf_counter() - t0
        else:
            step = make_parallel_train_step(trainer, mesh)
            tgt = mix * 0.9
            state = jax.device_get(state0)
            # warmup/compile
            state, metrics = step(state, (mix, tgt), key)
            jax.block_until_ready(metrics)
            t0 = time.perf_counter()
            for i in range(args.steps):
                state, metrics = step(state, (mix, tgt),
                                      jax.random.fold_in(key, i))
            # fetch a scalar: reliable completion barrier even over tunnels
            float(list(metrics.values())[0])
            dt = time.perf_counter() - t0
        sps = args.steps / dt
        audio_s = sps * batch * args.audio_len
        per_dev = audio_s / n
        if base is None:
            base = per_dev
        print(json.dumps({
            "metric": f"{args.mode}_step_scaling", "devices": n,
            "steps_per_s": round(sps, 3),
            "audio_s_per_s": round(audio_s, 2),
            "audio_s_per_s_per_device": round(per_dev, 2),
            "efficiency_vs_1dev": round(per_dev / base, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
