#!/usr/bin/env python
"""Summarize a debug_grads diagnostic window (round-5 grad/cond
root-cause tooling).

Parses the train log's ``[step] k=v ...`` rows and reports, for the
gradient-attribution metrics emitted by ``GanTrainer`` with
``debug_grads: true``:

- mean/median/p90/max of grad/cond and each gdbg/cond_from_<family>
  (score_mse | mel_l1 | gan) — which loss family carries the explosion;
- per-submodule conditioner grad norms (gdbg/cond.<sub>) ranked;
- parameter-norm trends (pnorm/*) first->last, the weight-norm
  shrinkage check (AdamW decay on weight-norm v rescales effective
  grads as 1/||v||).

Usage: python scripts/analyze_grad_diag.py out/train_logs/r5diag.log
"""
import json
import re
import sys
from collections import defaultdict

import numpy as np


def parse(path):
    rows = []
    pat = re.compile(r"^\[(\d+)\] (.*)$")
    for line in open(path):
        m = pat.match(line.strip())
        if not m:
            continue
        row = {"step": int(m.group(1))}
        for tok in m.group(2).split():
            if "=" in tok:
                k, v = tok.split("=", 1)
                try:
                    row[k] = float(v)
                except ValueError:
                    pass
        rows.append(row)
    return rows


def stats(vals):
    a = np.asarray(vals, dtype=np.float64)
    return {"mean": float(a.mean()), "median": float(np.median(a)),
            "p90": float(np.percentile(a, 90)), "max": float(a.max())}


def main():
    rows = parse(sys.argv[1])
    if not rows:
        raise SystemExit("no step rows parsed")
    series = defaultdict(list)
    for r in rows:
        for k, v in r.items():
            if k != "step":
                series[k].append(v)

    out = {"n_rows": len(rows),
           "step_range": [rows[0]["step"], rows[-1]["step"]]}

    fam = {k: stats(v) for k, v in series.items()
           if k.startswith("gdbg/cond_from_") or k == "grad/cond"}
    out["cond_by_loss_family"] = fam

    subs = {k: stats(v) for k, v in series.items()
            if k.startswith("gdbg/cond.")}
    out["cond_by_submodule"] = dict(
        sorted(subs.items(), key=lambda kv: -kv[1]["p90"]))

    pn = {k: {"first": series[k][0], "last": series[k][-1],
              "ratio": series[k][-1] / max(series[k][0], 1e-12)}
          for k in series if k.startswith("pnorm/")}
    out["param_norms"] = pn

    other = {k: stats(v) for k, v in series.items()
             if k.startswith("gdbg/") and "_from_" in k
             and not k.startswith("gdbg/cond")}
    if other:
        out["other_by_loss_family"] = other

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
