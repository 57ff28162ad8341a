"""Run the REAL `bin/train` CLI multi-host on a virtual mesh.

Launches N_PROC processes x N_DEV virtual CPU devices each of the actual
training CLI (not a unit-test harness) against a tiny config:
`jax.distributed` coordinator rendezvous, a global data mesh over all
N_PROC*N_DEV devices, per-host input sharding
(`build_datamodule(shard_rank=process_index)`), cross-host validation
metric reduction, and rank-0-only checkpointing all exercised end to end.

SURVEY §2.8 TPU plan (jax.distributed.initialize + per-host pipeline);
the reference validates the analogous path only by running Lightning DDP
for real.

    python scripts/multihost_cli_run.py --n-proc 2 --n-dev 4 --steps 20
"""
import argparse
import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-proc", type=int, default=2)
    ap.add_argument("--n-dev", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default="out/multihost_cli")
    ap.add_argument("--timeout", type=float, default=3600)
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    coord = f"127.0.0.1:{free_port()}"
    ckpt = out / "ckpt"

    # tiny full-stack config: real GAN trainer, real data pipeline on the
    # synthetic corpus, batch 8 so each of the 8 global devices gets 1
    overrides = [
        "run.max_steps=%d" % args.steps,
        "run.val_every=%d" % args.steps,
        "run.ckpt_every=%d" % args.steps,
        "run.log_every=5",
        "run.num_val_samples=0",
        "run.max_enh_batches=1",
        f"run.ckpt_dir={ckpt}",
        "run.best_snapshot_dir=",
        "model.n_channels=8", "model.noise_cond_dim=64", "model.n_rff=8",
        "model.n_mels=16", "model.diffusion.n_steps=2",
        "datamodule.batch_size=8", "datamodule.audio_len=1.0",
        "datamodule.num_workers=1",
    ]

    procs = []
    logs = []
    t0 = time.time()
    for pid in range(args.n_proc):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            # XLA:CPU's Gloo pair-context rendezvous has a hard 30 s
            # KV-store deadline; the shared persistent compile cache
            # SERIALIZES the ranks' AOT loads (file locks), so a
            # cache-warm rank dispatches its first collective minutes
            # before the other and dies in that deadline (observed:
            # rank0 JaxRuntimeError "Gloo context initialization failed:
            # DEADLINE_EXCEEDED" on an otherwise idle host). Cold
            # symmetric compiles keep every dispatch aligned; the
            # pre-loop coordination barrier in bin/train covers the
            # residual jitter.
            "JAX_ENABLE_COMPILATION_CACHE": "false",
            "XLA_FLAGS": ("--xla_force_host_platform_device_count=%d"
                          % args.n_dev),
            "JAX_COORDINATOR_ADDRESS": coord,
            "JAX_NUM_PROCESSES": str(args.n_proc),
            "JAX_PROCESS_ID": str(pid),
        })
        log = open(out / f"rank{pid}.log", "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "open_universe_tpu.bin.train",
             "--config", "open_universe_tpu/config/synth_quality_16k_r4.yaml",
             "--fresh", *overrides],
            cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT))

    try:
        rc = [p.wait(timeout=args.timeout) for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:  # never leave orphan ranks fighting for the host
            if p.poll() is None:
                p.kill()
        rc = [p.wait() for p in procs]
        print(f"TIMEOUT after {args.timeout}s; ranks killed", flush=True)
    for log in logs:
        log.close()
    dt = time.time() - t0

    # verify: every rank reached the final step; the logged global train
    # losses agree across ranks (same all-reduced value)
    last = {}
    for pid in range(args.n_proc):
        txt = (out / f"rank{pid}.log").read_text()
        lines = [ln for ln in txt.splitlines()
                 if ln.startswith(f"[{args.steps}] ")]
        # steps_per_s is wall-clock (rank-local); every other logged value
        # is the all-reduced global metric and must agree bit-for-bit
        last[pid] = (" ".join(t for t in lines[-1].split()
                              if not t.startswith("steps_per_s="))
                     if lines else None)
    ok = (all(r == 0 for r in rc) and all(v is not None for v in last.values())
          and len(set(last.values())) == 1)
    summary = {"n_proc": args.n_proc, "n_dev_per_proc": args.n_dev,
               "global_devices": args.n_proc * args.n_dev,
               "steps": args.steps, "return_codes": rc,
               "wall_s": round(dt, 1),
               "final_step_rows_identical_across_ranks":
                   len(set(last.values())) == 1,
               "final_row": last.get(0), "ok": ok}
    with open(out / "summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    if not ok:
        raise SystemExit("multihost CLI run FAILED — see rank logs in "
                         + str(out))


if __name__ == "__main__":
    main()
