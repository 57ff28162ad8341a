"""Degradation battery for calibrating the native metric scorers.

Runs a fixed, reproducible battery of degradations (additive noise at
stepped SNRs, lowpass filtering, clipping, hum, gain, small delay) on
synthetic speech-shaped utterances and scores every condition with the
in-repo native metrics (PESQ-WB/NB from native/pesq.cpp, STOI/ESTOI,
SI-SDR, LSD). When the canonical `pesq` / `pystoi` PyPI packages are
importable (not in the zero-egress image — run this anywhere they exist),
it ALSO scores each condition with them and prints per-condition deltas +
the max absolute deviation, turning this script into the cross-check the
calibration note (CALIBRATION.md) calls for.

Output: CALIBRATION_battery.json at the repo root (or --out).

Run: PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/metric_battery.py
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np
from scipy.signal import butter, lfilter

sys.path.insert(0, str(Path(__file__).parent))
from make_synthetic_corpus import synth_speech  # noqa: E402

from open_universe_tpu.metrics.pesq import pesq as native_pesq  # noqa: E402
from open_universe_tpu.metrics.stoi import stoi  # noqa: E402
from open_universe_tpu.metrics.sisdr import si_sdr  # noqa: E402
from open_universe_tpu.metrics.lsd import log_spectral_distance  # noqa: E402

try:
    from pesq import pesq as itu_pesq
except ImportError:
    itu_pesq = None
try:
    from pystoi import stoi as pystoi_stoi
except ImportError:
    pystoi_stoi = None


def degrade(ref, fs, kind, param, rng):
    n = len(ref)
    if kind == "identity":
        return ref.copy()
    if kind == "white_snr":
        noise = rng.standard_normal(n)
        g = np.sqrt(np.mean(ref**2) / (np.mean(noise**2)
                                       * 10 ** (param / 10)))
        return ref + g * noise
    if kind == "pink_snr":
        noise = lfilter([1.0], [1.0, -0.97], rng.standard_normal(n))
        g = np.sqrt(np.mean(ref**2) / (np.mean(noise**2)
                                       * 10 ** (param / 10)))
        return ref + g * noise
    if kind == "lowpass":
        b, a = butter(6, param / (fs / 2), "low")
        return lfilter(b, a, ref)
    if kind == "clip":
        t = param * np.max(np.abs(ref))
        return np.clip(ref, -t, t)
    if kind == "hum":
        tt = np.arange(n) / fs
        amp = param * np.sqrt(np.mean(ref**2)) * np.sqrt(2)
        return ref + amp * np.sin(2 * np.pi * 60.0 * tt)
    if kind == "gain":
        return ref * param
    if kind == "delay_ms":
        # pure delay: degraded is LONGER, no content lost (a truncating
        # variant would legitimately lose speech and score worse)
        d = int(param * fs / 1000)
        return np.concatenate([np.zeros(d, ref.dtype), ref])
    if kind == "piecewise_delay_ms":
        # time-warp: second half delayed by param ms relative to the first
        # (exercises P.862 utterance splitting / variable delay; a global-
        # delay-only aligner scores this as massive distortion).  The warp
        # is placed at the quietest 20 ms frame near the middle: a warp in
        # silence is INAUDIBLE, so the score must match identity; a warp
        # mid-speech is a real audible interruption and is out of scope
        # for the invariance anchor.
        d = int(param * fs / 1000)
        hop = int(0.02 * fs)
        k0, k1 = int(0.3 * n) // hop, int(0.7 * n) // hop
        en = [np.sum(ref[k * hop:(k + 1) * hop] ** 2) for k in range(k0, k1)]
        mid = (k0 + int(np.argmin(en))) * hop + hop // 2
        return np.concatenate([ref[:mid], np.zeros(d, ref.dtype), ref[mid:]])
    if kind == "mnru_q":
        # Modulated Noise Reference Unit (ITU-T P.810): speech-correlated
        # noise at Q dB — the standard anchor degradation family used in
        # the P.862 conformance corpora
        noise = rng.standard_normal(n)
        return ref * (1.0 + 10 ** (-param / 20) * noise)
    raise ValueError(kind)


CONDITIONS = (
    [("identity", 0.0)]
    + [("white_snr", s) for s in (40, 30, 20, 15, 10, 5, 0)]
    + [("pink_snr", s) for s in (20, 10, 0)]
    + [("lowpass", f) for f in (3400, 2000, 1000)]
    + [("clip", c) for c in (0.5, 0.2, 0.05)]
    + [("hum", a) for a in (0.1, 0.5)]
    + [("gain", g) for g in (0.5, 2.0)]
    + [("delay_ms", d) for d in (5.0, 20.0, 300.0)]
    + [("piecewise_delay_ms", d) for d in (8.0, 40.0)]
    + [("mnru_q", q) for q in (45, 35, 25, 15, 5)]
)

# Expected-range anchors for PESQ-WB (MOS-LQO), asserted by --check and
# the test suite.  Sources: the P.862.2 mapping's fixed ceiling (4.64),
# the alignment invariances the algorithm guarantees by construction
# (delay/gain must not change the score), and coarse bands consistent
# with published P.862 behaviour on noise/MNRU condition families (exact
# mid-range values are implementation-sensitive; bands are deliberately
# wide enough to catch gross breakage, not to certify conformance).
PESQ_WB_ANCHORS = {
    ("identity", 0.0): (4.60, 4.65),
    ("white_snr", 40): (3.0, 4.6),
    ("white_snr", 20): (1.6, 3.2),
    ("white_snr", 0): (0.9, 1.8),
    ("mnru_q", 45): (3.0, 4.6),
    ("mnru_q", 5): (0.9, 2.0),
}
# score must equal the identity score: pure-delay conditions are handled
# entirely by the time-alignment stage.  Tolerance is per condition:
# exact for constant delays; piecewise warps get a small allowance (when
# the quietest available split point still carries residual energy, a
# small penalty is a real audible interruption, not an aligner error).
PESQ_WB_DELAY_INVARIANT = {("delay_ms", 5.0): 0.02,
                           ("delay_ms", 20.0): 0.02,
                           ("delay_ms", 300.0): 0.02,
                           ("piecewise_delay_ms", 8.0): 0.10,
                           ("piecewise_delay_ms", 40.0): 0.15}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fs", type=int, default=16000)
    ap.add_argument("--n-utts", type=int, default=6)
    ap.add_argument("--dur", type=float, default=4.0)
    ap.add_argument("--out", default="CALIBRATION_battery.json")
    args = ap.parse_args()
    fs = args.fs
    n = int(args.dur * fs)

    rng = np.random.default_rng(2026)
    refs = [synth_speech(rng, n, fs)[0].astype(np.float64)
            for _ in range(args.n_utts)]

    rows = []
    for kind, param in CONDITIONS:
        drng = np.random.default_rng(7)
        scores = {}
        for ref in refs:
            deg = degrade(ref, fs, kind, param, drng).astype(np.float64)
            # PESQ handles unequal lengths (its aligner exists for this);
            # the sample-aligned metrics need equal-length views
            dg = deg[:len(ref)] if len(deg) > len(ref) else deg
            vals = {
                "pesq_wb_native": native_pesq(fs, ref, deg, "wb"),
                "stoi": stoi(ref, dg, fs),
                "estoi": stoi(ref, dg, fs, extended=True),
                "si_sdr": float(si_sdr(dg[None], ref[None])[0]),
                "lsd": float(np.mean(log_spectral_distance(
                    dg[None], ref[None]))),
            }
            if itu_pesq is not None:
                vals["pesq_wb_itu"] = float(itu_pesq(
                    fs, ref.astype(np.float32), deg.astype(np.float32),
                    "wb"))
            if pystoi_stoi is not None:
                vals["stoi_pystoi"] = float(pystoi_stoi(ref, dg, fs))
                vals["estoi_pystoi"] = float(pystoi_stoi(
                    ref, dg, fs, extended=True))
            for k, v in vals.items():
                scores.setdefault(k, []).append(v)
        row = {"condition": kind, "param": param,
               **{k: round(float(np.mean(v)), 4) for k, v in scores.items()}}
        rows.append(row)
        print(" ".join(f"{k}={v}" for k, v in row.items()), flush=True)

    # ---- anchor checks (expected ranges + delay invariance) ----
    by_cond = {(r["condition"], r["param"]): r for r in rows}
    anchor_failures = []
    for cond, (lo, hi) in PESQ_WB_ANCHORS.items():
        v = by_cond[cond]["pesq_wb_native"]
        ok = lo <= v <= hi
        print(f"anchor {cond}: {v:.3f} in [{lo}, {hi}] -> "
              f"{'OK' if ok else 'FAIL'}")
        if not ok:
            anchor_failures.append({"condition": list(cond), "value": v,
                                    "range": [lo, hi]})
    ident = by_cond[("identity", 0.0)]["pesq_wb_native"]
    for cond, tol in PESQ_WB_DELAY_INVARIANT.items():
        v = by_cond[cond]["pesq_wb_native"]
        ok = abs(v - ident) < tol
        print(f"delay-invariance {cond}: {v:.3f} vs identity {ident:.3f} "
              f"(tol {tol}) -> {'OK' if ok else 'FAIL'}")
        if not ok:
            anchor_failures.append({"condition": list(cond), "value": v,
                                    "expected": ident})
    # monotonicity within each degradation family (stronger param = worse)
    for fam in ("white_snr", "pink_snr", "mnru_q"):
        seq = [r["pesq_wb_native"] for r in rows if r["condition"] == fam]
        mono = all(a >= b for a, b in zip(seq, seq[1:]))
        print(f"monotone {fam}: {['%.3f' % s for s in seq]} -> "
              f"{'OK' if mono else 'FAIL'}")
        if not mono:
            anchor_failures.append({"condition": [fam, "monotone"],
                                    "value": seq})

    out = {"fs": fs, "n_utts": args.n_utts, "dur_s": args.dur,
           "canonical_pesq_available": itu_pesq is not None,
           "canonical_pystoi_available": pystoi_stoi is not None,
           "anchor_failures": anchor_failures,
           "rows": rows}
    if itu_pesq is not None:
        dev = [abs(r["pesq_wb_native"] - r["pesq_wb_itu"]) for r in rows]
        out["pesq_max_abs_dev"] = round(max(dev), 4)
        print(f"\nPESQ-WB max |native - ITU| over battery: {max(dev):.3f}")
    if pystoi_stoi is not None:
        dev = [abs(r["estoi"] - r["estoi_pystoi"]) for r in rows]
        out["estoi_max_abs_dev"] = round(max(dev), 4)
        print(f"ESTOI max |native - pystoi| over battery: {max(dev):.3f}")
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
