"""End-of-training serving-path evaluation: f32 vs bf16-stored params.

Closes VERDICT item 9: serve the trained checkpoint through the real
``bin/enhance`` CLI twice — once with ``--param-dtype float32`` and once
with the production default ``bfloat16`` — then score both outputs with
``bin/eval_metrics`` against the clean references and print a side-by-side
table plus the per-file output correlation between the two parameter
storages.  Run on the chip after (or between) training runs:

    python scripts/serving_eval.py exp/synth_quality_16k data/synthetic/test

Parity target: reference ``bin/enhance.py`` + ``bin/eval_metrics.py``
composed serving flow (reference README.md:70-96).
"""
import argparse
import json
import subprocess
import sys
from pathlib import Path

import numpy as np


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def load_wav(path):
    from open_universe_tpu.data.wavio import read_wav
    x, _fs = read_wav(str(path))
    return np.asarray(x, dtype=np.float64).reshape(-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", help="checkpoint dir (e.g. exp/synth_quality_16k)")
    ap.add_argument("test_dir", help="dir containing noisy/ and clean/")
    ap.add_argument("--step", default="best")
    ap.add_argument("--out", default="out/serving_eval")
    ap.add_argument("--metrics", nargs="+",
                    default=["si-sdr", "lsd", "stoi-ext", "pesq-wb"])
    ap.add_argument("--limit", type=int, default=0,
                    help="evaluate only the first N test files (0 = all)")
    args = ap.parse_args()

    noisy = Path(args.test_dir) / "noisy"
    clean = Path(args.test_dir) / "clean"
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    src = noisy
    if args.limit:
        src = out / "noisy_subset"
        src.mkdir(exist_ok=True)
        for f in sorted(noisy.glob("*.wav"))[:args.limit]:
            tgt = src / f.name
            if not tgt.exists():
                tgt.write_bytes(f.read_bytes())

    results = {}
    for dtype in ("float32", "bfloat16"):
        dst = out / dtype
        run([sys.executable, "-m", "open_universe_tpu.bin.enhance",
             str(src), str(dst), "--ckpt", args.ckpt, "--step", args.step,
             "--param-dtype", dtype])
        run([sys.executable, "-m", "open_universe_tpu.bin.eval_metrics",
             str(dst), "--ref", str(clean), "--metrics", *args.metrics,
             "--output", str(dst / "metrics.json")])
        with open(dst / "metrics.json") as f:
            store = json.load(f)
        vals = [v for k, v in store.items() if isinstance(v, dict)]
        results[dtype] = {
            m: float(np.mean([v[m] for v in vals
                              if m in v and not np.isnan(v[m])]))
            for m in args.metrics}

    # per-file waveform correlation between the two storages
    corrs = []
    for f in sorted((out / "float32").glob("*.wav")):
        g = out / "bfloat16" / f.name
        if not g.exists():
            continue
        a, b = load_wav(f), load_wav(g)
        n = min(len(a), len(b))
        a, b = a[:n], b[:n]
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        if denom > 0:
            corrs.append(float(np.dot(a, b) / denom))

    print("\n## Serving-path eval (trained checkpoint, --step "
          f"{args.step})\n")
    hdr = "| param storage | " + " | ".join(args.metrics) + " |"
    print(hdr)
    print("|" + "---|" * (len(args.metrics) + 1))
    for dtype in ("float32", "bfloat16"):
        row = " | ".join(f"{results[dtype][m]:.4g}" for m in args.metrics)
        print(f"| {dtype} | {row} |")
    if corrs:
        print(f"\nbf16-vs-f32 output correlation: mean {np.mean(corrs):.6f}"
              f", min {np.min(corrs):.6f} over {len(corrs)} files")
    with open(out / "summary.json", "w") as f:
        json.dump({"results": results,
                   "corr_mean": float(np.mean(corrs)) if corrs else None,
                   "corr_min": float(np.min(corrs)) if corrs else None,
                   "n_files": len(corrs)}, f, indent=2)
    print(f"\nsummary written to {out / 'summary.json'}")


if __name__ == "__main__":
    main()
