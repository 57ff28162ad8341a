"""Sampler-steps quality/throughput tradeoff on a trained checkpoint.

The 8-step reverse SDE is the serving hot loop (7 score U-Net passes +
1 conditioner pass); throughput scales ~1/n_steps. This script serves a
trained checkpoint at several ``--n-steps`` settings through the real
``bin/enhance`` + ``bin/eval_metrics`` CLIs and prints the
quality-vs-steps table, so deployments can pick their operating point.

    python scripts/sampler_steps_eval.py exp/synth_quality_16k \
        data/synthetic/test --steps-list 2 4 8 16 [--limit 8]

Reference counterpart: ``enhance`` exposes n_steps but no tradeoff study
exists (reference universe.py:300-343).
"""
import argparse
import json
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("test_dir")
    ap.add_argument("--step", default="best")
    ap.add_argument("--steps-list", type=int, nargs="+",
                    default=[2, 4, 8, 16])
    ap.add_argument("--metrics", nargs="+",
                    default=["si-sdr", "lsd", "stoi-ext", "pesq-wb"])
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--out", default="out/sampler_steps_eval")
    args = ap.parse_args()

    noisy = Path(args.test_dir) / "noisy"
    clean = Path(args.test_dir) / "clean"
    out = Path(args.out)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)

    src = noisy
    if args.limit:
        src = out / "noisy_subset"
        src.mkdir()
        for f in sorted(noisy.glob("*.wav"))[:args.limit]:
            (src / f.name).write_bytes(f.read_bytes())

    rows = {}
    for n in args.steps_list:
        dst = out / f"nsteps_{n}"
        run([sys.executable, "-m", "open_universe_tpu.bin.enhance",
             str(src), str(dst), "--ckpt", args.ckpt, "--step", args.step,
             "--n-steps", str(n)])
        run([sys.executable, "-m", "open_universe_tpu.bin.eval_metrics",
             str(dst), "--ref", str(clean), "--metrics", *args.metrics,
             "--recompute", "--output", str(dst / "metrics.json")])
        with open(dst / "metrics.json") as f:
            store = json.load(f)
        vals = [v for v in store.values() if isinstance(v, dict)]
        rows[n] = {}
        for m in args.metrics:
            ok = [v[m] for v in vals if m in v and not np.isnan(v[m])]
            rows[n][m] = float(np.mean(ok)) if ok else None

    print(f"\n## Sampler steps tradeoff ({args.ckpt} --step {args.step})\n")
    print("| n_steps | " + " | ".join(args.metrics) + " | rel. serving cost |")
    print("|" + "---|" * (len(args.metrics) + 2))
    for n in args.steps_list:
        cells = " | ".join("n/a" if rows[n][m] is None else
                           f"{rows[n][m]:.3f}" for m in args.metrics)
        print(f"| {n} | {cells} | ~{n}/8 |")
    with open(out / "summary.json", "w") as f:
        json.dump({"ckpt": args.ckpt, "step_arg": args.step,
                   "rows": rows}, f, indent=2)
    print(f"\nsummary written to {out / 'summary.json'}")


if __name__ == "__main__":
    main()
