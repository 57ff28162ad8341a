"""scripts/log_to_jsonl.py — the committed-evidence rebuild tool.

Every quality table in QUALITY.md is generated from a stdout log by this
script, so its trajectory semantics ARE the evidence semantics (round-3
ADVICE item 1: a naive last-wins dedup stitched two optimizer
trajectories into one table). Pinned here:

  - ``resumed from ... @ step N`` invalidates previously-parsed rows
    with step > N (abandoned trajectory), including an INTENTIONAL
    rewind to an earlier committed checkpoint (round-4 continuation:
    resume @ 9000 after the log already holds rows to 14750);
  - re-logged steps after a resume overwrite the checkpointed range;
  - malformed lines are counted, not silently dropped;
  - NaN/inf serialize as JSON null (strict JSON).
"""
import importlib.util
import json
import sys
from pathlib import Path

spec = importlib.util.spec_from_file_location(
    "log_to_jsonl",
    Path(__file__).resolve().parent.parent / "scripts" / "log_to_jsonl.py")
log_to_jsonl = importlib.util.module_from_spec(spec)
spec.loader.exec_module(log_to_jsonl)


def test_resume_drops_abandoned_trajectory(tmp_path):
    log = tmp_path / "run.log"
    log.write_text("\n".join([
        "[100] train/loss=1.0000",
        "[200] train/loss=0.9000",
        "[val 200] val/pesq=1.5000",
        "[300] train/loss=0.8000",  # abandoned: crash after 300
        "resumed from exp/run @ step 200",
        "[300] train/loss=0.7500",  # surviving trajectory re-logs 300
        "[400] train/loss=0.7000",
    ]) + "\n")
    rows, n_skipped, n_resumes = log_to_jsonl.parse(log)
    assert n_resumes == 1 and n_skipped == 0
    by_step = {(r["step"], "val/pesq" in r): r for r in rows}
    assert by_step[(300, False)]["train/loss"] == 0.75  # not 0.8
    assert by_step[(200, True)]["val/pesq"] == 1.5  # <= ckpt rows survive


def test_intentional_rewind_keeps_only_surviving_trajectory(tmp_path):
    """Round-4 continuation shape: the session boundary forced a resume
    from an EARLIER committed snapshot (9000) than the log's deepest row
    (14750). Only the continuation trajectory may appear past 9000."""
    log = tmp_path / "run.log"
    lines = [f"[{s}] train/loss={1.0 - s / 20000:.4f}"
             for s in range(1000, 15000, 1000)]
    lines += ["resumed from exp/run @ step 9000",
              "[10000] train/loss=0.4200",
              "[val 10000] val/pesq=1.6900"]
    log.write_text("\n".join(lines) + "\n")
    rows, _, n_resumes = log_to_jsonl.parse(log)
    assert n_resumes == 1
    steps_after_9000 = sorted(r["step"] for r in rows if r["step"] > 9000)
    assert steps_after_9000 == [10000, 10000]  # train + val rows only
    train10k = [r for r in rows
                if r["step"] == 10000 and "train/loss" in r][0]
    assert train10k["train/loss"] == 0.42  # continuation row, not 0.5


def test_malformed_counted_and_nan_serializes_null(tmp_path, monkeypatch):
    log = tmp_path / "run.log"
    log.write_text("\n".join([
        "[100] train/loss=1.0 garbage-token",   # malformed: no k=v
        "[200] train/loss=oops",                 # malformed: non-numeric
        "[300] train/loss=nan grad/score=inf",
    ]) + "\n")
    rows, n_skipped, _ = log_to_jsonl.parse(log)
    assert n_skipped == 2
    assert len(rows) == 1
    out = tmp_path / "m.jsonl"
    monkeypatch.setattr(sys, "argv", ["log_to_jsonl", str(log), str(out)])
    log_to_jsonl.main()
    payload = [json.loads(line) for line in out.read_text().splitlines()]
    assert payload[0]["skipped_malformed_lines"] == 2  # provenance row
    assert payload[1]["train/loss"] is None
    assert payload[1]["grad/score"] is None
