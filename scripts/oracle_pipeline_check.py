"""Oracle-score serving-path check: is the SI-SDR floor pipeline or training?

Runs the REAL serving path (``bin/enhance`` CLI -> Orbax restore ->
pad/normalize/transform -> 8-step reverse-SDE sampler -> inverse ->
``bin/eval_metrics``) with the sampler's analytic oracle score
``-(x - target)/sigma^2`` (+ a controlled amount of score noise) in place
of the trained network — the reference's ``fake_score_snr`` test
mechanism (reference universe.py:278-298).

If the serving pipeline were responsible for the strongly negative
val/test SI-SDR of early-training checkpoints, the oracle legs would
inherit that floor.  If instead the pipeline is quality-transparent, the
oracle legs produce strongly positive SI-SDR, pinning the floor on the
training stage (number of optimizer steps), not the serving math.

    python scripts/oracle_pipeline_check.py artifacts/synth_quality_16k_best \
        data/synthetic/val --limit 6 --snrs 40 5
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
    ap.add_argument("val_dir", help="dir containing noisy/ and clean/")
    ap.add_argument("--step", default="best")
    ap.add_argument("--out", default="out/oracle_check")
    ap.add_argument("--limit", type=int, default=6)
    ap.add_argument("--snrs", type=float, nargs="+", default=[40.0, 5.0],
                    help="fake-score SNRs (dB); 5.0 is the reference's "
                    "default oracle setting, 40.0 is near-perfect score")
    ap.add_argument("--metrics", nargs="+",
                    default=["si-sdr", "sdr", "lsd", "stoi-ext", "pesq-wb"])
    args = ap.parse_args()

    noisy = Path(args.val_dir) / "noisy"
    clean = Path(args.val_dir) / "clean"
    out = Path(args.out)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)

    src = out / "noisy_subset"
    src.mkdir()
    names = [f.name for f in sorted(noisy.glob("*.wav"))[:args.limit]]
    for n in names:
        (src / n).write_bytes((noisy / n).read_bytes())
    ref = out / "clean_subset"
    ref.mkdir()
    for n in names:
        (ref / n).write_bytes((clean / n).read_bytes())

    results = {}
    for snr in args.snrs:
        dst = out / f"oracle_snr{snr:g}"
        run([sys.executable, "-m", "open_universe_tpu.bin.enhance",
             str(src), str(dst), "--ckpt", args.ckpt, "--step",
             str(args.step), "--oracle-ref-dir", str(ref),
             "--fake-score-snr", str(snr)])
        run([sys.executable, "-m", "open_universe_tpu.bin.eval_metrics",
             str(dst), "--ref", str(ref), "--metrics", *args.metrics,
             "--recompute", "--output", str(dst / "metrics.json")])
        with open(dst / "metrics.json") as f:
            store = json.load(f)
        vals = [v for k, v in store.items() if isinstance(v, dict)]
        results[f"oracle_snr{snr:g}"] = {
            m: float(np.mean([v[m] for v in vals
                              if m in v and not np.isnan(v[m])]))
            for m in args.metrics}

    print("\n## Oracle-score serving-path check\n")
    hdr = "| leg | " + " | ".join(args.metrics) + " |"
    print(hdr)
    print("|" + "---|" * (len(args.metrics) + 1))
    for leg, r in results.items():
        print("| " + leg + " | "
              + " | ".join(f"{r[m]:.4g}" for m in args.metrics) + " |")
    with open(out / "summary.json", "w") as f:
        json.dump({"ckpt": args.ckpt, "step_arg": args.step,
                   "n_files": len(names), "results": results}, f, indent=2)
    print(f"\nsummary written to {out / 'summary.json'}")


if __name__ == "__main__":
    main()


