"""Offline folder resampler.

Usage:
    python -m open_universe_tpu.prepare.resample <src> <dst> --fs 16000

Parity target: reference ``prepare/resample.py`` (soxr-based). Uses the
native C++ polyphase resampler (native/audio_io.cpp) when built, else
scipy.
"""
import argparse
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path


def _resample_one(args):
    src, dst, fs = args
    import math

    import numpy as np

    from ..data.wavio import read_wav, write_wav

    x, in_fs = read_wav(src)
    if in_fs != fs:
        try:
            from .. import native
            if native.is_available():
                chans = [native.resample(x[:, c], in_fs, fs)
                         for c in range(x.shape[1])]
                x = np.stack(chans, axis=1)
            else:
                raise RuntimeError
        except Exception:
            from scipy.signal import resample_poly
            g = math.gcd(in_fs, fs)
            x = resample_poly(x, fs // g, in_fs // g, axis=0)
    write_wav(dst, x, fs)
    return dst


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("source", type=Path)
    parser.add_argument("dest", type=Path)
    parser.add_argument("--fs", type=int, default=16000)
    parser.add_argument("--workers", type=int, default=8)
    args = parser.parse_args(argv)

    files = sorted(args.source.rglob("*.wav"))
    jobs = []
    for f in files:
        rel = f.relative_to(args.source)
        dst = args.dest / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        jobs.append((f, dst, args.fs))
    with ThreadPoolExecutor(max_workers=args.workers) as pool:
        for i, _ in enumerate(pool.map(_resample_one, jobs)):
            if (i + 1) % 200 == 0:
                print(f"[{i + 1}/{len(jobs)}]")
    print(f"resampled {len(jobs)} files -> {args.dest} @ {args.fs} Hz")


if __name__ == "__main__":
    main()
