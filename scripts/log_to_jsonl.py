"""Reconstruct a metrics.jsonl from a train CLI stdout log.

`bin/train` prints every metrics row it logs as ``[N] k=v ...`` /
``[val N] k=v ...`` in addition to appending to ``metrics.jsonl`` in the
run dir.  When the run dir does not survive (this image's workspace is
reset between rounds; only committed files persist) but the captured
stdout log does, this tool rebuilds the JSONL evidence artifact from it.

Resume overlaps (the watchdog restarts from the last checkpoint, so steps
since that checkpoint are re-run and re-logged) are deduplicated keeping
the LAST occurrence per (step, kind) — i.e. the values that correspond to
the surviving optimizer trajectory.

    python scripts/log_to_jsonl.py out/train_logs/synth_quality_r3.log \
        artifacts/synth_quality_16k_r3_metrics.jsonl
"""
import argparse
import json
import re
from pathlib import Path

LINE = re.compile(r"^\[(val )?(\d+)\] (.*)$")


def parse(log_path):
    rows = {}  # (step, is_val) -> dict, last wins
    order = []
    for line in Path(log_path).read_text().splitlines():
        m = LINE.match(line.strip())
        if not m:
            continue
        is_val, step = bool(m.group(1)), int(m.group(2))
        d = {"step": step}
        ok = True
        for kv in m.group(3).split():
            if "=" not in kv:
                ok = False
                break
            k, v = kv.split("=", 1)
            try:
                d[k] = float(v)
            except ValueError:
                ok = False
                break
        if not ok:
            continue
        key = (step, is_val)
        if key not in rows:
            order.append(key)
        rows[key] = d
    return [rows[k] for k in sorted(order)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("out")
    args = ap.parse_args()
    rows = parse(args.log)
    with open(args.out, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    n_val = sum(1 for r in rows if any(k.startswith("val/") for k in r))
    print(f"{len(rows)} rows ({n_val} val) -> {args.out}")


if __name__ == "__main__":
    main()
