"""Reconstruct a metrics.jsonl from a train CLI stdout log.

`bin/train` prints every metrics row it logs as ``[N] k=v ...`` /
``[val N] k=v ...`` in addition to appending to ``metrics.jsonl`` in the
run dir.  When the run dir does not survive (this image's workspace is
reset between rounds; only committed files persist) but the captured
stdout log does, this tool rebuilds the JSONL evidence artifact from it.

Resume overlaps (the watchdog restarts from the last checkpoint, so steps
since that checkpoint are re-run and re-logged) are handled by trajectory
tracking: every ``resumed from ... @ step N`` marker invalidates all
previously-parsed rows with step > N (they belong to an abandoned
pre-crash optimizer trajectory that the surviving run never reached), and
later re-logged steps then overwrite the checkpointed range.  The output
therefore contains ONLY the surviving optimizer trajectory.

Malformed metric lines are counted and reported (not silently dropped),
NaN/inf values serialize as JSON ``null``, and values are limited to the
%.4f precision ``bin/train`` prints — both caveats are recorded in a
leading provenance row.

    python scripts/log_to_jsonl.py out/train_logs/synth_quality_r3.log \
        artifacts/synth_quality_16k_r3_metrics.jsonl
"""
import argparse
import json
import math
import re
from pathlib import Path

LINE = re.compile(r"^\[(val )?(\d+)\] (.*)$")
RESUME = re.compile(r"resumed from .* @ step (\d+)")


def parse(log_path):
    rows = {}  # (step, is_val) -> dict, last wins
    n_skipped = 0
    n_resumes = 0
    for line in Path(log_path).read_text().splitlines():
        line = line.strip()
        rm = RESUME.search(line)
        if rm:
            # Everything beyond the checkpoint step belongs to the
            # abandoned pre-crash trajectory; drop it.  The resumed run
            # re-logs those steps as it re-reaches them.
            ckpt = int(rm.group(1))
            rows = {k: v for k, v in rows.items() if k[0] <= ckpt}
            n_resumes += 1
            continue
        m = LINE.match(line)
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
            n_skipped += 1
            continue
        rows[(step, is_val)] = d
    out = [rows[k] for k in sorted(rows)]
    return out, n_skipped, n_resumes


def _jsonable(r):
    return {k: (None if isinstance(v, float) and not math.isfinite(v) else v)
            for k, v in r.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("out")
    args = ap.parse_args()
    rows, n_skipped, n_resumes = parse(args.log)
    prov = {
        "provenance": "rebuilt from stdout log by scripts/log_to_jsonl.py",
        "log": str(args.log),
        "precision": "values rounded to 4 decimals by bin/train's printer",
        "resume_markers": n_resumes,
        "skipped_malformed_lines": n_skipped,
    }
    with open(args.out, "w") as fh:
        fh.write(json.dumps(prov, allow_nan=False) + "\n")
        for r in rows:
            fh.write(json.dumps(_jsonable(r), allow_nan=False) + "\n")
    n_val = sum(1 for r in rows if any(k.startswith("val/") for k in r))
    print(f"{len(rows)} rows ({n_val} val), {n_skipped} malformed lines "
          f"skipped, {n_resumes} resume markers -> {args.out}")


if __name__ == "__main__":
    main()
