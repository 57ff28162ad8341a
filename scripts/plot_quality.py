"""Plot training/validation quality curves from a run's metrics.jsonl.

Produces QUALITY_curves.png: train losses (gen/disc/mel/score) and val
quality metrics (PESQ, SI-SDR, ESTOI, LSD, val score loss) vs step.

Run: python scripts/plot_quality.py exp/synth_quality_16k [--out X.png]
"""
import argparse
import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def load(path):
    rows = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line:
                r = json.loads(line)
                if "step" in r:
                    rows.append(r)
    return rows


def series(rows, key):
    # keep the LAST record per step (restarts from a checkpoint re-log
    # the overlapping steps; the final attempt is the one that counts)
    pts = {}
    for r in rows:
        if key in r:
            pts[r["step"]] = r[key]
    steps = sorted(pts)
    return steps, [pts[s] for s in steps]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--out", default="QUALITY_curves.png")
    args = ap.parse_args()
    p = Path(args.run_dir)
    rows = load(p if p.is_file() else p / "metrics.jsonl")

    panels = [
        ("train losses", [("train/loss_gen", "gen"),
                          ("train/loss_disc", "disc")], None),
        ("train terms", [("train/signal_mel", "L1-mel"),
                         ("train/score", "score MSE")], "log"),
        ("val PESQ-WB (native)", [("val/pesq", "pesq")], None),
        ("val SI-SDR (dB)", [("val/si-sdr", "si-sdr")], None),
        ("val ESTOI", [("val/estoi", "estoi")], None),
        ("val LSD / score", [("val/lsd", "lsd"),
                             ("val/score", "score loss")], None),
    ]
    fig, axes = plt.subplots(2, 3, figsize=(15, 7))
    for ax, (title, keys, scale) in zip(axes.flat, panels):
        for key, label in keys:
            s, v = series(rows, key)
            if s:
                ax.plot(s, v, label=label, lw=1.2)
        ax.set_title(title, fontsize=10)
        ax.set_xlabel("step", fontsize=8)
        if scale:
            ax.set_yscale(scale)
        ax.legend(fontsize=8)
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out}")

    # final-value summary for QUALITY.md
    for key in ("val/pesq", "val/si-sdr", "val/estoi", "val/lsd",
                "val/score"):
        s, v = series(rows, key)
        if s:
            print(f"{key}: first={v[0]:.4f} best="
                  f"{(max if key != 'val/lsd' and key != 'val/score' else min)(v):.4f} "
                  f"last={v[-1]:.4f} @step {s[-1]}")


if __name__ == "__main__":
    main()
