"""Results table generator.

Usage:
    python -m open_universe_tpu.bin.make_table results1.json [results2.json ...]

Parity target: reference ``bin/make_table.py`` — aggregates metric JSON
stores into the README-style comparison table.
"""
import argparse
import json
from pathlib import Path

import numpy as np
from tabulate import tabulate


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("results", nargs="+", help="metric JSON stores")
    parser.add_argument("--fmt", default="github")
    args = parser.parse_args(argv)

    rows = []
    all_metrics = []
    for path in args.results:
        with open(path) as f:
            store = json.load(f)
        metrics = sorted({m for v in store.values() for m in v})
        for m in metrics:
            if m not in all_metrics:
                all_metrics.append(m)
        row = {"model": Path(path).parent.name or Path(path).stem,
               "n": len(store)}
        for m in metrics:
            vals = [v[m] for v in store.values()
                    if m in v and not np.isnan(v[m])]
            row[m] = float(np.mean(vals)) if vals else None
        rows.append(row)

    headers = ["model", "n"] + all_metrics
    table = [[r.get(h) for h in headers] for r in rows]
    print(tabulate(table, headers=headers, floatfmt=".3f", tablefmt=args.fmt))


if __name__ == "__main__":
    main()
