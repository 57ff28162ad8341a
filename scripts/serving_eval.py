"""End-of-training serving-path evaluation: f32 vs bf16-stored params.

Serves a trained checkpoint through the real ``bin/enhance`` CLI twice —
once with ``--param-dtype float32`` and once with the production default
``bfloat16`` — then scores both outputs with ``bin/eval_metrics`` against
the clean references and writes a side-by-side table plus the per-file
output correlation between the two parameter storages.

Safety rails (round-2 ADVICE): the resolved checkpoint step is read
BEFORE anything runs and stamped into the output path and summary.json
(``--min-step`` fails fast on an accidentally-untrained checkpoint);
output dirs are step-stamped and cleared before reuse; metrics are always
recomputed from the wavs just generated.

    python scripts/serving_eval.py exp/synth_quality_16k data/synthetic/test

Parity target: reference ``bin/enhance.py`` + ``bin/eval_metrics.py``
composed serving flow (reference README.md:70-96).
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


def load_wav(path):
    from open_universe_tpu.data.wavio import read_wav
    x, _fs = read_wav(str(path))
    return np.asarray(x, dtype=np.float64).reshape(-1)


def resolve_step(ckpt_dir, step):
    """Resolve 'best'/'last'/N to the concrete step using the pointer
    files, without loading the checkpoint."""
    ckpt_dir = Path(ckpt_dir)
    if step == "best":
        ptr = ckpt_dir / "best.json"
    elif step in (None, "last"):
        ptr = ckpt_dir / "last.json"
    else:
        return int(step)
    if not ptr.exists():
        raise FileNotFoundError(f"{ptr} not found — nothing to evaluate")
    with open(ptr) as f:
        return int(json.load(f)["step"])


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
    ap.add_argument("--min-step", type=int, default=0,
                    help="fail fast if the resolved checkpoint step is "
                    "below this (guards against silently scoring a "
                    "near-untrained model)")
    args = ap.parse_args()

    step = resolve_step(args.ckpt, args.step)
    print(f"resolved --step {args.step} -> step {step} in {args.ckpt}",
          flush=True)
    if step < args.min_step:
        raise SystemExit(
            f"resolved step {step} < --min-step {args.min_step}; refusing "
            f"to produce an eval that looks trained but is not")

    noisy = Path(args.test_dir) / "noisy"
    clean = Path(args.test_dir) / "clean"
    # step-stamped output root: re-runs at another step/checkpoint can
    # never mix with these artifacts
    out = Path(args.out) / f"step_{step}"
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)

    src = noisy
    if args.limit:
        src = out / "noisy_subset"
        src.mkdir()
        for f in sorted(noisy.glob("*.wav"))[:args.limit]:
            (src / f.name).write_bytes(f.read_bytes())

    results = {}
    for dtype in ("float32", "bfloat16"):
        dst = out / dtype
        # pass the ORIGINAL step arg through: "best" loads the persistent
        # best/ checkpoint, while numbered step_N dirs are subject to
        # keep_last pruning; the resolved number is for labeling/guarding
        run([sys.executable, "-m", "open_universe_tpu.bin.enhance",
             str(src), str(dst), "--ckpt", args.ckpt,
             "--step", str(args.step), "--param-dtype", dtype])
        run([sys.executable, "-m", "open_universe_tpu.bin.eval_metrics",
             str(dst), "--ref", str(clean), "--metrics", *args.metrics,
             "--recompute", "--output", str(dst / "metrics.json")])
        with open(dst / "metrics.json") as f:
            store = json.load(f)
        vals = [v for k, v in store.items() if isinstance(v, dict)]
        results[dtype] = {}
        for m in args.metrics:
            ok = [v[m] for v in vals if m in v and not np.isnan(v[m])]
            results[dtype][m] = float(np.mean(ok)) if ok else None

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

    print(f"\n## Serving-path eval ({args.ckpt} @ step {step}, "
          f"--step {args.step})\n")
    hdr = "| param storage | " + " | ".join(args.metrics) + " |"
    print(hdr)
    print("|" + "---|" * (len(args.metrics) + 1))
    for dtype in ("float32", "bfloat16"):
        row = " | ".join(
            "n/a" if results[dtype][m] is None else f"{results[dtype][m]:.4g}"
            for m in args.metrics)
        print(f"| {dtype} | {row} |")
    if corrs:
        print(f"\nbf16-vs-f32 output correlation: mean {np.mean(corrs):.6f}"
              f", min {np.min(corrs):.6f} over {len(corrs)} files")
    with open(out / "summary.json", "w") as f:
        json.dump({"ckpt": str(args.ckpt), "step_arg": args.step,
                   "resolved_step": step,
                   "n_test_files": len(list((out / "float32").glob("*.wav"))),
                   "results": results,
                   "corr_mean": float(np.mean(corrs)) if corrs else None,
                   "corr_min": float(np.min(corrs)) if corrs else None,
                   "n_files": len(corrs)}, f, indent=2)
    print(f"\nsummary written to {out / 'summary.json'}")


if __name__ == "__main__":
    main()
