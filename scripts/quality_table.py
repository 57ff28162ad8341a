"""Generate the QUALITY.md results table from a run's metrics.jsonl.

Every number in QUALITY.md must trace to a committed artifact (round-2
VERDICT item 7); this script IS that trace: it renders the validation
table (and optionally the sustained step rate) straight from the metrics
log, so the doc can be regenerated rather than hand-edited.

    python scripts/quality_table.py exp/synth_quality_16k [--every 1000]
"""
import argparse
import json
from pathlib import Path


def load(path):
    rows = []
    with open(path) as fh:
        for line in fh:
            if line.strip():
                r = json.loads(line)
                if "step" in r:
                    rows.append(r)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run", help="run dir or metrics.jsonl path")
    ap.add_argument("--every", type=int, default=1000)
    args = ap.parse_args()
    p = Path(args.run)
    if p.is_dir():
        p = p / "metrics.jsonl"
    rows = load(p)

    # last record per step wins (restarts re-log overlapping steps)
    val = {}
    for r in rows:
        if "val/score" in r:
            val[r["step"]] = r
    print("| step | val/score | LSD | ESTOI | PESQ-WB | SI-SDR dB |")
    print("|---|---|---|---|---|---|")
    for s in sorted(val):
        if s % args.every and s != max(val):
            continue
        r = val[s]
        print(f"| {s} | {r['val/score']:.3f} | {r['val/lsd']:.2f} "
              f"| {r['val/estoi']:.3f} | {r['val/pesq']:.3f} "
              f"| {r['val/si-sdr']:.1f} |")

    rates = [r["steps_per_s"] for r in rows
             if "steps_per_s" in r and r["steps_per_s"] > 0.2]
    if rates:
        import statistics
        print(f"\nsustained step rate: median "
              f"{statistics.median(rates):.3f} steps/s over "
              f"{len(rates)} logged windows")


if __name__ == "__main__":
    main()
