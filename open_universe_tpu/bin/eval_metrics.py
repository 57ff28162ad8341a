"""Batch metric evaluation CLI.

Usage:
    python -m open_universe_tpu.bin.eval_metrics <enhanced_dir>
        --ref <clean_dir> [--metrics si-sdr lsd stoi-ext pesq-wb]
        [--output results.json]

Parity target: reference ``bin/eval_metrics.py`` (56-191): per-file
metrics over a folder with an incremental JSON result store
(skip-already-computed), plus a mean summary.
"""
import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None):
    from .common import respect_platform_env
    respect_platform_env()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("enhanced", help="folder of enhanced wavs")
    parser.add_argument("--ref", required=True, help="folder of clean refs")
    parser.add_argument("--metrics", nargs="+",
                        default=["si-sdr", "sdr", "lsd", "stoi-ext"])
    parser.add_argument("--output", default=None,
                        help="JSON result store (default <enhanced>/metrics.json)")
    parser.add_argument("--recompute", action="store_true")
    args = parser.parse_args(argv)

    from ..data.wavio import read_wav
    from ..metrics import Metrics

    enh_dir = Path(args.enhanced)
    ref_dir = Path(args.ref)
    out_path = Path(args.output) if args.output else enh_dir / "metrics.json"

    store = {}
    if out_path.exists() and not args.recompute:
        with open(out_path) as f:
            store = json.load(f)

    metrics = Metrics(args.metrics)
    files = sorted(enh_dir.glob("*.wav"))
    for i, p in enumerate(files):
        key = p.stem
        have = store.get(key, {})
        if all(m in have for m in args.metrics):
            continue
        ref_p = ref_dir / p.name
        if not ref_p.exists():
            print(f"skip {key}: no reference")
            continue
        est, fs = read_wav(p)
        ref, fs2 = read_wav(ref_p)
        assert fs == fs2, (fs, fs2)
        vals = metrics(est[:, 0], ref[:, 0], fs, key=key)
        store[key] = {**have, **vals}
        if (i + 1) % 20 == 0 or i == len(files) - 1:
            with open(out_path, "w") as f:
                json.dump(store, f, indent=1)
            print(f"[{i + 1}/{len(files)}] saved {out_path}")

    with open(out_path, "w") as f:
        json.dump(store, f, indent=1)

    # summary
    summary = {}
    for m in args.metrics:
        vals = [v[m] for v in store.values()
                if m in v and not np.isnan(v[m])]
        if vals:
            summary[m] = float(np.mean(vals))
    print(json.dumps({"n_files": len(store), "mean": summary}, indent=1))


if __name__ == "__main__":
    main()
