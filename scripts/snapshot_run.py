#!/usr/bin/env python
"""Snapshot a live run dir to a committable artifact, or rebuild a live
run dir from one — the session-boundary handoff for long training runs.

The gitignored ``exp/`` run dir does not survive a driver session, but
``artifacts/`` does.  Workflow:

  # end of session: capture the latest FULL train state (+ best)
  python scripts/snapshot_run.py save exp/synth_quality_16k_r4 \
      artifacts/synth_quality_16k_r4_last
  git add artifacts/synth_quality_16k_r4_last && git commit ...

  # next session: rebuild and resume (also accepts a best-only
  # snapshot_best dir — step_N is synthesized from best/best.json)
  python scripts/snapshot_run.py restore \
      artifacts/synth_quality_16k_r4_last exp/synth_quality_16k_r4
  python -m open_universe_tpu.bin.train --config ... --supervise

Reference has no equivalent rail (its recovery story is Lightning
resume-from-``last.ckpt`` in a dir assumed persistent, train.py:171-181).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from open_universe_tpu.training.checkpoint import (  # noqa: E402
    restore_run_dir,
    snapshot_last,
)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("save", help="snapshot latest checkpoint -> artifact")
    s.add_argument("run_dir")
    s.add_argument("dest")
    s.add_argument("--no-best", action="store_true",
                   help="omit the best checkpoint from the snapshot")
    r = sub.add_parser("restore", help="rebuild live run dir from artifact")
    r.add_argument("snapshot")
    r.add_argument("run_dir")
    args = ap.parse_args()
    if args.cmd == "save":
        step = snapshot_last(args.run_dir, args.dest,
                             include_best=not args.no_best)
        if step is None:
            print(f"no checkpoint in {args.run_dir}", file=sys.stderr)
            raise SystemExit(1)
        print(f"snapshotted step {step} -> {args.dest}")
    else:
        step = restore_run_dir(args.snapshot, args.run_dir)
        print(f"rebuilt {args.run_dir} resumable @ step {step}")


if __name__ == "__main__":
    main()
