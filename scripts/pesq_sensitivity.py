"""Bark/threshold-table sensitivity study for the native PESQ scorer.

The one remaining documented simplification in ``native/pesq.cpp`` is that
the Bark band layout is generated analytically (Zwicker & Terhardt's 1980
closed form) and the absolute hearing threshold from Terhardt's
approximation, instead of the ITU-published lookup tables (not fetchable
in this zero-egress image).  This study BOUNDS the MOS error that choice
can introduce:

Part A derives the plausible deviation range in-repo: the analytic
critical-band-rate formula is compared against the classical published
Zwicker (1961) critical-band EDGE table (z = 1..24 at tabulated
frequencies) — the data the closed form approximates — giving the max
band-edge deviation in Bark and its equivalent relative frequency warp.
Terhardt (1979) states his threshold fit tracks the measured quiet
threshold within a few dB mid-band; +/-3 dB is used as a conservative
perturbation.

Part B re-scores the full frozen calibration battery
(``scripts/metric_battery.py`` conditions, same seeds) in subprocesses
with the scorer's band layout / threshold perturbed by those amounts
(env knobs OUNIV_PESQ_BARK_FWARP / OUNIV_PESQ_THRESH_DB_OFS, read once
per process in pesq.cpp) and reports the per-condition MOS drift, split
into mid-range (baseline 2.0-3.5, the "PESQ >= 3.0" decision band) and
overall.

    python scripts/pesq_sensitivity.py --out out/pesq_sensitivity.json
"""
import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

# Zwicker (1961) critical band edges, Hz: z = i at edge i (z=1..24).
ZWICKER_EDGES_HZ = [100, 200, 300, 400, 510, 630, 770, 920, 1080, 1270,
                    1480, 1720, 2000, 2320, 2700, 3150, 3700, 4400, 5300,
                    6400, 7700, 9500, 12000, 15500]


def hz_to_bark(f):
    return 13.0 * np.arctan(0.00076 * f) + 3.5 * np.arctan((f / 7500.0) ** 2)


def derive_deviation():
    """Max |analytic z - tabulated z| over the published band edges, and
    the equivalent relative frequency warp, restricted to the wideband
    PESQ range (<= 8 kHz)."""
    rows = []
    for i, f in enumerate(ZWICKER_EDGES_HZ, start=1):
        if f > 8000:
            continue
        z = float(hz_to_bark(f))
        dz = z - i
        # local slope dz/df -> equivalent relative frequency deviation
        slope = float(hz_to_bark(f * 1.001) - z) / (0.001 * f)
        rows.append({"edge_hz": f, "z_table": i, "z_analytic": round(z, 4),
                     "dz": round(dz, 4),
                     "eq_rel_f_dev": round(abs(dz) / (slope * f), 5)})
    max_dz = max(abs(r["dz"]) for r in rows)
    max_eps = max(r["eq_rel_f_dev"] for r in rows)
    return rows, max_dz, max_eps


def score_battery_child():
    """Child mode: score the battery's conditions with native PESQ only,
    honoring whatever env knobs are set, and print one JSON line."""
    from metric_battery import CONDITIONS, degrade, synth_speech
    from open_universe_tpu.metrics.pesq import pesq as native_pesq

    fs, dur, n_utts = 16000, 4.0, 6
    n = int(dur * fs)
    rng = np.random.default_rng(2026)
    refs = [synth_speech(rng, n, fs)[0].astype(np.float64)
            for _ in range(n_utts)]
    out = {}
    for kind, param in CONDITIONS:
        drng = np.random.default_rng(7)
        vals = []
        for ref in refs:
            deg = degrade(ref, fs, kind, param, drng).astype(np.float64)
            vals.append(native_pesq(fs, ref, deg, "wb"))
        out[f"{kind}:{param}"] = round(float(np.mean(vals)), 4)
    print(json.dumps(out))


def run_setting(fwarp, tofs):
    env = dict(os.environ)
    env["OUNIV_PESQ_BARK_FWARP"] = str(fwarp)
    env["OUNIV_PESQ_THRESH_DB_OFS"] = str(tofs)
    r = subprocess.run([sys.executable, __file__, "--score-child"],
                       env=env, capture_output=True, text=True, check=True)
    return json.loads(r.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--score-child", action="store_true")
    ap.add_argument("--out", default="out/pesq_sensitivity.json")
    args = ap.parse_args()
    if args.score_child:
        score_battery_child()
        return

    rows, max_dz, max_eps = derive_deviation()
    print(f"Part A: analytic-vs-Zwicker-table band edges: max |dz| = "
          f"{max_dz:.3f} Bark, equivalent relative frequency deviation "
          f"<= {max_eps:.3%}")
    eps = round(max_eps * 1.25, 4)  # 25% safety margin
    tdb = 3.0
    print(f"perturbation range used: fwarp +/-{eps}, threshold +/-{tdb} dB")

    settings = [("baseline", 0.0, 0.0),
                (f"fwarp+{eps}", eps, 0.0), (f"fwarp-{eps}", -eps, 0.0),
                (f"thresh+{tdb}", 0.0, tdb), (f"thresh-{tdb}", 0.0, -tdb),
                (f"both+", eps, tdb), (f"both-", -eps, -tdb)]
    scores = {}
    for name, fw, to in settings:
        scores[name] = run_setting(fw, to)
        print(f"scored {name}", flush=True)

    base = scores["baseline"]
    mid = [c for c, v in base.items() if 2.0 <= v <= 3.5]
    report = {"part_a": {"rows": rows, "max_dz_bark": max_dz,
                         "max_eq_rel_f_dev": max_eps,
                         "fwarp_used": eps, "thresh_db_used": tdb},
              "baseline": base, "settings": {}, "mid_range_conditions": mid}
    print(f"\n{'setting':14s} {'max|d| mid-range':>18s} {'max|d| all':>12s}")
    worst_mid = 0.0
    for name, _fw, _to in settings[1:]:
        d = {c: scores[name][c] - base[c] for c in base}
        dmid = max(abs(d[c]) for c in mid) if mid else 0.0
        dall = max(abs(v) for v in d.values())
        worst_mid = max(worst_mid, dmid)
        report["settings"][name] = {"drift": {c: round(v, 4)
                                              for c, v in d.items()},
                                    "max_abs_mid": round(dmid, 4),
                                    "max_abs_all": round(dall, 4)}
        print(f"{name:14s} {dmid:18.4f} {dall:12.4f}")
    report["worst_mid_range_drift"] = round(worst_mid, 4)
    print(f"\nworst mid-range (2.0-3.5 MOS) drift over all perturbations: "
          f"+/-{worst_mid:.3f} MOS")
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report written to {args.out}")


if __name__ == "__main__":
    main()
