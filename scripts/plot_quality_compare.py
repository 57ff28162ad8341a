"""Side-by-side validation-curve comparison of two quality runs.

Round-4 use: the reference-faithful 2 s-crop recipe (r4) vs the 4 s-crop
round-3 run — same model/optimizer, half the audio per step. X axis is
BOTH optimizer steps and on-chip hours (2 s crops run 2x the steps/hour),
which is the honest comparison for a wall-clock-bounded run.

    python scripts/plot_quality_compare.py \
        artifacts/synth_quality_16k_r3_metrics.jsonl 1.309 \
        artifacts/synth_quality_16k_r4_metrics.jsonl 0.651 \
        --labels "r3 4s-crop" "r4 2s-crop" --out QUALITY_r4_vs_r3.png
"""
import argparse
import json
import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


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
    pts = {}
    for r in rows:
        if key in r:
            pts[r["step"]] = r[key]
    steps = sorted(pts)
    return steps, [pts[s] for s in steps]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl_a")
    ap.add_argument("sec_per_step_a", type=float)
    ap.add_argument("jsonl_b")
    ap.add_argument("sec_per_step_b", type=float)
    ap.add_argument("--labels", nargs=2, default=["run A", "run B"])
    ap.add_argument("--out", default="QUALITY_compare.png")
    args = ap.parse_args()

    runs = [(load(args.jsonl_a), args.sec_per_step_a, args.labels[0], "C0"),
            (load(args.jsonl_b), args.sec_per_step_b, args.labels[1], "C1")]
    keys = [("val/pesq", "val PESQ-WB"), ("val/estoi", "val ESTOI"),
            ("val/lsd", "val LSD"), ("val/score", "val score loss")]

    fig, axes = plt.subplots(2, 4, figsize=(17, 6.5))
    for col, (key, title) in enumerate(keys):
        for rows, sps, label, color in runs:
            s, v = series(rows, key)
            axes[0, col].plot(s, v, marker=".", ms=3, label=label,
                              color=color)
            axes[1, col].plot([x * sps / 3600.0 for x in s], v, marker=".",
                              ms=3, label=label, color=color)
        axes[0, col].set_title(title, fontsize=9)
        axes[0, col].set_xlabel("optimizer step", fontsize=8)
        axes[1, col].set_xlabel("on-chip hours", fontsize=8)
        for ax in (axes[0, col], axes[1, col]):
            ax.grid(alpha=0.25)
            ax.tick_params(labelsize=7)
    axes[0, 0].legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
