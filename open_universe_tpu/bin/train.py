"""Training CLI.

Usage:
    python -m open_universe_tpu.bin.train --config <yaml> [key=value ...]

Parity target: reference ``train.py`` (experiment driver): builds the
datamodule/model/trainer from config, resumes from the last checkpoint,
runs the train loop with periodic validation (per-sigma-bin score losses +
enhancement metrics on a few batches) and checkpointing. Metrics go to
stdout and ``<ckpt_dir>/metrics.jsonl``.

TPU specifics: the train step is jit'ed once per bucket shape with donated
state; multi-device runs shard the batch over a `data` mesh.
"""
import argparse
import json
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    import sys

    raw_argv = list(argv) if argv is not None else sys.argv[1:]
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--fresh", action="store_true",
                        help="archive a populated non-resumable ckpt_dir "
                        "to <dir>.bak-N and start from step 0 (without "
                        "this flag, starting fresh into a populated dir "
                        "is refused; resumable dirs always resume)")
    parser.add_argument("--supervise", action="store_true",
                        help="run under the heartbeat watchdog: stalls "
                        "(hung device RPC) and crashes auto-restart from "
                        "the last checkpoint")
    parser.add_argument("--stall-timeout", type=float, default=1800.0)
    parser.add_argument("--max-restarts", type=int, default=20)
    parser.add_argument("overrides", nargs="*", default=[])
    args = parser.parse_args(argv)

    if args.supervise:
        # resolve ckpt_dir from config only — no jax, no device init in
        # the supervisor process (it must survive a dead tunnel)
        from pathlib import Path as _P

        from ..config import load_config as _load
        from ..training.watchdog import supervise_self

        ckpt_dir = _P(_load(args.config, args.overrides)["run"]["ckpt_dir"])
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        raise SystemExit(supervise_self(
            raw_argv, ckpt_dir / "heartbeat.json",
            stall_timeout=args.stall_timeout,
            max_restarts=args.max_restarts))

    import jax

    from .common import respect_platform_env
    respect_platform_env()
    import jax.numpy as jnp

    from ..config import load_config
    from ..metrics.eval import EvalMetrics
    from ..parallel import default_mesh, make_parallel_train_step
    from ..parallel.multihost import (
        align_processes,
        final_sync,
        initialize_distributed,
        is_rank_zero,
    )
    from ..runtime import build_datamodule, build_model, build_trainer
    from ..training.checkpoint import (
        latest_step,
        prepare_run_dir,
        restore_checkpoint,
        save_best_checkpoint,
        save_checkpoint,
        snapshot_best,
        snapshot_last,
    )
    from ..training.watchdog import write_heartbeat
    from ..training.cloud_sync import CloudBackup
    from ..utils.logging import MetricsLogger

    initialize_distributed()
    cfg = load_config(args.config, args.overrides)
    run = cfg["run"]
    if args.max_steps is not None:
        run["max_steps"] = args.max_steps

    # checkpoint-safety gate BEFORE anything touches the run dir: a
    # resumable dir always resumes; a populated non-resumable dir is
    # refused unless --fresh archives it (round-2 postmortem: a fresh
    # restart pruned/overwrote a 4000-step chip asset)
    if is_rank_zero():
        run_info = prepare_run_dir(run["ckpt_dir"], fresh=args.fresh)
        print(f"run_id={run_info['run_id']} resume={run_info['resume']}",
              flush=True)

    # TPU production precision: params stay f32, matmul/conv operands are
    # cast (measured ~2x train-step throughput; bf16 output correlates
    # 1.000000 with f32, PERF.md). Default: bf16 on accelerators, f32 on
    # CPU (no native bf16 there). Override with run.compute_dtype.
    on_accel = jax.default_backend() not in ("cpu",)
    dtype = run.get("compute_dtype", "bfloat16" if on_accel else "float32")
    if dtype and dtype != "float32":
        from ..ops.conv import set_compute_dtype
        set_compute_dtype(dtype)
    if run.get("pallas_gru", False) and jax.default_backend() in ("tpu",
                                                                   "axon"):
        from ..ops.gru import set_use_pallas_gru
        set_use_pallas_gru(True)

    model = build_model(cfg["model"])
    trainer = build_trainer(model, cfg["trainer"])
    n_proc = jax.process_count() if jax.process_count() else 1
    dm = build_datamodule(cfg["datamodule"],
                          shard_rank=jax.process_index(),
                          shard_count=n_proc)

    key = jax.random.PRNGKey(run.get("seed", 0))
    key, k_init = jax.random.split(key)
    audio_len = int(cfg["datamodule"].get("audio_len", 4.0)
                    * cfg["model"].get("fs", 16000))

    from ..runtime import host_init

    if cfg["trainer"].get("kind") == "lora":
        init_kwargs = {}
    elif cfg["trainer"].get("kind") == "mdn":
        init_kwargs = {"batch": cfg["datamodule"].get("batch_size", 8)}
    else:
        # params are length-independent; init with a short example
        init_kwargs = {"example_len": min(audio_len, model.tot_ds * 10),
                       "batch": cfg["datamodule"].get("batch_size", 8)}

    ckpt_dir = Path(run["ckpt_dir"])
    start_step = 0
    if latest_step(ckpt_dir) is not None:
        # resume: the init values are discarded, so don't compute them —
        # eval_shape traces the state template with zero compute/compiles
        # (the full-size eager host init is hundreds of small op compiles,
        # measured 4-20+ min on a contended 2-vCPU host; it made resumes
        # look like startup wedges). One pinned device_put after restore,
        # same as host_init (see runtime.host_init for why the explicit
        # target matters for donation).
        import functools

        template = jax.eval_shape(
            functools.partial(trainer.init, **init_kwargs), k_init)
        state, start_step = restore_checkpoint(ckpt_dir, template)
        state = jax.device_put(state, jax.local_devices()[0])
        print(f"resumed from {ckpt_dir} @ step {start_step}")
    else:
        state = host_init(trainer.init, k_init, **init_kwargs)

    import math as _math

    devices = jax.devices()
    batch_size = cfg["datamodule"].get("batch_size", 8)
    n_data = _math.gcd(batch_size, len(devices))
    if n_data > 1:
        mesh = default_mesh(n_data)
        step_fn = make_parallel_train_step(trainer, mesh)
        print(f"data-parallel over {n_data} devices")
    else:
        step_fn = jax.jit(trainer.train_step, donate_argnums=(0,))

    tokenizer = None
    coords_ds = None  # AlignedNoisyDataset with TextGrid span supervision
    if cfg["trainer"].get("kind") == "text_gan":
        from ..text import CharTokenizer
        tcfg = cfg["model"].get("text", {})
        tokenizer = CharTokenizer(max_len=tcfg.get("text_max_len", 128),
                                  sil_token=tcfg.get("sil_token", False))
        train_ds = dm.datasets.get("train")
        if (hasattr(train_ds, "token_coords")
                and getattr(train_ds, "textgrid_path", None) is not None):
            train_ds.tokenizer = tokenizer
            coords_ds = train_ds

    eval_metrics = EvalMetrics(audio_fs=cfg["model"].get("fs", 16000))
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    mlog = MetricsLogger(ckpt_dir, run_name=cfg.get("name"),
                         use_wandb=run.get("wandb", False) and is_rank_zero(),
                         config=cfg)
    backup = CloudBackup(ckpt_dir)
    if backup.enabled:
        backup.trigger()

    heartbeat_file = ckpt_dir / "heartbeat.json"

    # compile-phase liveness: the first jit of the one-jit train step can
    # exceed the watchdog's stall timeout (measured >30 min for the
    # text-GAN graph on a contended 2-vCPU CPU backend), during which the
    # main thread is blocked inside XLA and writes no heartbeat. Beat
    # from a daemon thread until the first real metrics fetch, then hand
    # over to strict step-based beats (a hung chip RPC after that point
    # still trips the watchdog as designed).
    import threading

    _first_metrics = threading.Event()

    def _compile_beat():
        while not _first_metrics.wait(60.0):
            write_heartbeat(heartbeat_file, start_step,
                            extra={"phase": "compile"})

    threading.Thread(target=_compile_beat, daemon=True).start()

    def log(step, metrics, prefix=""):
        _first_metrics.set()
        mlog.log(step, metrics)
        msg = " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items())
        print(f"[{prefix}{step}] {msg}", flush=True)
        # metrics were fetched from the device, so the chip is provably
        # alive — beat the watchdog (training/watchdog.py)
        write_heartbeat(heartbeat_file, step)

    write_heartbeat(heartbeat_file, start_step)

    # multi-process: leave the per-rank startup jitter (datamodule scan,
    # init/restore, logger setup) at a generous coordination-service
    # barrier so the first sharded dispatch — whose Gloo context
    # rendezvous has a hard ~30 s deadline on the CPU backend — happens
    # in lockstep (parallel.multihost.align_processes)
    align_processes("pre_train_loop")

    step = start_step
    max_steps = run["max_steps"]
    t_last = time.time()
    epoch = 0
    while step < max_steps:
        for item in dm.iter_split("train", epoch=epoch,
                                  with_indices=coords_ds is not None):
            if step >= max_steps:
                break
            if coords_ds is not None:
                (noisy, clean, txts, mask), idxs = item
            else:
                noisy, clean, txts, mask = item
            key, k_step = jax.random.split(key)
            if tokenizer is not None:
                ids, tmask = tokenizer(txts)
                batch = {"mix": jnp.asarray(noisy),
                         "target": jnp.asarray(clean),
                         "text_ids": jnp.asarray(ids),
                         "text_mask": jnp.asarray(tmask),
                         "pad_mask": jnp.asarray(mask < 0.5)}
                if coords_ds is not None:
                    cs, vs = zip(*(coords_ds.token_coords(
                        Path(coords_ds.file_list[i]).stem) for i in idxs))
                    batch["text_coords"] = jnp.asarray(np.stack(cs))
                    batch["text_coords_valid"] = jnp.asarray(np.stack(vs))
            else:
                batch = (jnp.asarray(noisy), jnp.asarray(clean))
            state, metrics = step_fn(state, batch, k_step)
            step += 1

            if step % run.get("log_every", 50) == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["steps_per_s"] = run.get("log_every", 50) / (
                    time.time() - t_last)
                t_last = time.time()
                log(step, m)
                # NaN tripwire (the reference drops into breakpoint() on
                # non-finite losses, universe.py:526-528 / train.py:69's
                # detect_anomaly). Here: abort WITHOUT checkpointing so
                # the last good checkpoint survives; under --supervise
                # the watchdog restarts from it with a fresh noise
                # stream. Disable with run.nan_abort: false.
                if run.get("nan_abort", True):
                    bad = [k for k, v in m.items()
                           if k.startswith("train/")
                           and not _math.isfinite(v)]
                    if bad:
                        raise RuntimeError(
                            f"NaN tripwire at step {step}: non-finite "
                            f"{bad}; aborting without checkpoint (last "
                            f"good checkpoint preserved)")
                # host-RSS recycle: long runs can leak HOST memory in
                # layers below us (observed: the remote-device client
                # grew ~13 MB/step until the kernel OOM-killed a 3 h
                # run). Bound it the production way: checkpoint HERE and
                # exit with a restart code — under --supervise the
                # watchdog relaunches a fresh process that resumes from
                # this exact step (zero step loss). run.max_host_rss_gb
                # (0 disables).
                rss_limit = run.get("max_host_rss_gb", 64)
                if rss_limit and _host_rss_gb() > rss_limit:
                    print(f"[recycle] host RSS "
                          f"{_host_rss_gb():.1f} GB > {rss_limit} GB at "
                          f"step {step}; checkpointing and restarting "
                          f"to bound the leak", flush=True)
                    if is_rank_zero():
                        save_checkpoint(ckpt_dir, step,
                                        jax.device_get(state), config=cfg,
                                        keep_last=run.get("keep_last", 2))
                    backup.trigger()
                    backup.wait()
                    mlog.close()
                    raise SystemExit(75)  # watchdog: restart + resume

            if step % run.get("val_every", 5000) == 0 and "val" in dm.batchers:
                key, k_val = jax.random.split(key)
                state, vmetrics = validate(state, trainer, dm, eval_metrics,
                                           run, k_val, step, log)
                # keep the single best checkpoint by the configured monitor
                # (reference ModelCheckpoint save_top_k=1 monitoring
                # cfg.model.validation.main_loss with main_loss_mode,
                # train.py:141-150 + config/model/default.yaml:73-74;
                # val/score and val/pesq are the reference's documented
                # choices)
                monitor = run.get("main_loss", "val/score")
                minimize = run.get("main_loss_mode", "min") == "min"
                score = vmetrics.get(monitor)
                if score is not None and is_rank_zero() and \
                        save_best_checkpoint(ckpt_dir, step,
                                             jax.device_get(state), score,
                                             minimize=minimize):
                    if run.get("best_snapshot_dir"):
                        snapshot_best(ckpt_dir, run["best_snapshot_dir"])
                    backup.trigger()

            # rank-0-only writes: the train state is replicated across
            # hosts (invariance-tested), so one writer suffices — and on a
            # shared filesystem concurrent writers would race on the same
            # checkpoint dir (reference parity: Lightning saves rank 0)
            if step % run.get("ckpt_every", 5000) == 0 and is_rank_zero():
                save_checkpoint(ckpt_dir, step, jax.device_get(state),
                                config=cfg, keep_last=run.get("keep_last", 2))
                # session-boundary handoff: mirror the latest FULL train
                # state to a committable artifact (the run dir itself is
                # typically gitignored/ephemeral); ~1% overhead at 1k-step
                # cadence for a 1.1 GB full-size state
                if run.get("last_snapshot_dir"):
                    snapshot_last(ckpt_dir, run["last_snapshot_dir"],
                                  include_best=False)
                backup.trigger()
        epoch += 1

    # skip the final save when the loop already checkpointed this exact
    # step (max_steps a multiple of ckpt_every — the common case); the
    # redundant re-serialization doubled the shutdown tail
    if is_rank_zero() and step % run.get("ckpt_every", 5000) != 0:
        save_checkpoint(ckpt_dir, step, jax.device_get(state), config=cfg,
                        keep_last=run.get("keep_last", 2))
    backup.trigger()
    backup.wait()
    mlog.close()
    # all ranks must reach the distributed shutdown barrier together —
    # rank 0's checkpoint write above can outlast the barrier's ~5 min
    # deadline on a contended host, killing an otherwise-complete run
    # (see parallel.multihost.final_sync)
    final_sync()
    print(f"training done at step {step}; checkpoints in {ckpt_dir}")


def _host_rss_gb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1e6  # kB -> GB
    except OSError:
        pass
    return 0.0


def validate(state, trainer, dm, eval_metrics, run, key, step, log):
    import jax
    import jax.numpy as jnp

    from ..metrics.eval import AsyncEvalMetrics

    # host-side metric math (PESQ/STOI/DNSMOS) runs on a background
    # thread so the accelerator keeps dispatching enhance() batches
    # (the reference stalls the device on these, universe.py:706-720)
    async_eval = AsyncEvalMetrics(eval_metrics)
    vals = {}
    bin_losses = []
    n_enh = 0
    n_samples_saved = 0
    num_save = run.get("num_val_samples", 0)
    sample_dir = Path(run["ckpt_dir"]) / "val_samples"
    for i, (noisy, clean, txts, mask) in enumerate(dm.iter_split("val")):
        key, k1, k2 = jax.random.split(key, 3)
        batch = (jnp.asarray(noisy), jnp.asarray(clean))
        if hasattr(trainer, "val_score_losses"):
            n_bins = run.get("n_bins", 5)
            if getattr(trainer.cfg, "time_sampling", "") == "adaptive":
                n_bins = trainer.cfg.adaptive_n_bins
            losses, tb = trainer.val_score_losses(state, batch, k1,
                                                  n_bins=n_bins)
            bin_losses.append(np.asarray(losses))
            vals.setdefault("val/score", []).append(float(losses.mean()))
        if n_enh < run.get("max_enh_batches", 4):
            n_enh += 1
            if hasattr(trainer, "effective_params"):  # LoRA: base + adapters
                # device_get: adapter state may live on a mesh while the
                # frozen base params are single-device host constants
                params = trainer.effective_params(
                    jax.device_get(state.lora),
                    jax.device_get(state.train_extra))
            else:
                params = state.ema.params if hasattr(state, "ema") else None
            est = trainer.model.enhance(params, batch[0][..., 0], k2)
            async_eval.submit(est, batch[1][..., 0])
            # save a few audio samples (reference's TB audio dumps,
            # universe.py:663-704)
            if n_samples_saved < num_save:
                from ..data.wavio import write_wav
                sample_dir.mkdir(parents=True, exist_ok=True)
                fs = trainer.model.cfg.fs
                est_np = np.asarray(est)
                for b in range(min(est_np.shape[0],
                                   num_save - n_samples_saved)):
                    sid = f"{step}_{n_samples_saved}"
                    peak = max(np.abs(est_np[b]).max(), 1e-6)
                    write_wav(sample_dir / f"enh_{sid}.wav",
                              est_np[b] * (0.95 / max(peak, 0.95)), fs)
                    if step == run.get("val_every", 5000):  # first val only
                        write_wav(sample_dir / f"mix_{sid}.wav",
                                  np.asarray(noisy)[b, :, 0], fs)
                        write_wav(sample_dir / f"target_{sid}.wav",
                                  np.asarray(clean)[b, :, 0], fs)
                    n_samples_saved += 1
    for m in async_eval.drain():
        for k, v in m.items():
            vals.setdefault(f"val/{k}", []).append(v)
    async_eval.close()
    # cross-process mean (sync_dist parity): every host must base the
    # adaptive-sampling and best-checkpoint decisions on the SAME values,
    # or the nominally replicated train state diverges across hosts
    from ..parallel.multihost import all_mean_scalar_dict

    vmetrics = {k: float(np.mean(v)) for k, v in vals.items()}
    if bin_losses:
        mean_bins = np.stack(bin_losses).mean(0)
        vmetrics.update({f"_bin_{i}": float(v)
                         for i, v in enumerate(mean_bins)})
    vmetrics = all_mean_scalar_dict(vmetrics)
    mean_bins = [vmetrics.pop(k) for k in sorted(
        [k for k in vmetrics if k.startswith("_bin_")],
        key=lambda k: int(k.split("_")[-1]))]
    log(step, vmetrics, prefix="val ")
    # adaptive sigma sampling: importance-sample training time from the
    # mean per-bin val score losses (reference universe.py:630-638)
    if mean_bins and hasattr(trainer, "update_adaptive_sampling"):
        state = trainer.update_adaptive_sampling(state,
                                                 np.asarray(mean_bins))
    return state, vmetrics


if __name__ == "__main__":
    main()
