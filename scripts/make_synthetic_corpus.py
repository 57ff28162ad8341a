"""Synthetic speech-shaped denoising corpus (zero-egress stand-in for
Voicebank-DEMAND).

Formant speech synthesis: voiced/unvoiced excitation (impulse train with
a drifting F0 contour + aspiration noise) through a cascade of
time-varying second-order formant resonators interpolating between
vowel targets, with a syllabic amplitude envelope and pauses. Noise
side: colored noise (white/pink/brown), amplitude-modulated noise, and
"babble" (sum of other synthetic talkers), mixed at SNRs drawn from the
VB-DEMAND range (2.5-17.5 dB train, 0-15 dB test-style for val/test).

Layout matches data/prepare_voicebank_demand.sh -> NoisyDataset:
    <out>/{train,val,test}/{noisy,clean}/u%05d.wav

Run: PYTHONPATH=. python scripts/make_synthetic_corpus.py <out_dir>
         [--n-train 1500 --n-val 32 --n-test 24 --fs 16000 --dur 4.0]
"""
import argparse
import sys
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np
from scipy.signal import lfilter

VOWELS = [  # (F1, F2, F3) targets, Hz
    (730, 1090, 2440),   # a
    (270, 2290, 3010),   # i
    (300, 870, 2240),    # u
    (530, 1840, 2480),   # e
    (570, 840, 2410),    # o
    (660, 1720, 2410),   # ae
    (490, 1350, 1690),   # er
]
# transcript symbol per vowel (CharTokenizer charset: ascii lowercase)
VOWEL_CHARS = ["a", "i", "u", "e", "o", "y", "r"]


def _resonator_coeffs(f, bw, fs):
    r = np.exp(-np.pi * bw / fs)
    theta = 2.0 * np.pi * f / fs
    a = [1.0, -2.0 * r * np.cos(theta), r * r]
    g = (1.0 - r) * np.sqrt(1.0 - 2.0 * r * np.cos(2.0 * theta) + r * r)
    return [g, 0.0, 0.0], a


def synth_speech(rng, n, fs):
    """One synthetic utterance of n samples at fs."""
    frame = int(0.02 * fs)
    n_frames = n // frame
    tt_f = np.arange(n_frames) * 0.02

    # syllabic structure: voiced probability gate at ~3-5 Hz + pauses
    syl_rate = rng.uniform(2.5, 5.0)
    syl = 0.5 + 0.5 * np.sin(2 * np.pi * syl_rate * tt_f
                             + rng.uniform(0, 2 * np.pi))
    pause = np.ones(n_frames)
    n_pause = rng.integers(1, 4)
    for _ in range(n_pause):
        p0 = rng.integers(0, max(n_frames - 10, 1))
        pause[p0:p0 + rng.integers(8, 25)] = 0.0
    env_f = np.clip(syl, 0.05, 1.0) * pause
    voiced_f = (syl > rng.uniform(0.2, 0.45)) & (pause > 0)

    # F0 contour: random walk in log space, 80-250 Hz
    f0 = np.exp(np.cumsum(rng.standard_normal(n_frames) * 0.03)
                + np.log(rng.uniform(90, 220)))
    f0 = np.clip(f0, 70, 280)

    # vowel-target trajectory for the 3 formants.  The chosen vowel
    # sequence IS the utterance's transcript (returned alongside the
    # audio) — the synthesizer knows what it spoke, which gives the
    # text-conditioned models real aligned transcripts with zero egress.
    # Drawing indices first keeps the RNG stream identical to the
    # pre-transcript version of this file, so audio regenerates
    # bit-identically.
    n_seg = max(2, int(n_frames * 0.02 * syl_rate))
    vowel_idx = [int(rng.integers(len(VOWELS))) for _ in range(n_seg + 1)]
    targets = np.array([VOWELS[j] for j in vowel_idx])
    seg_pos = np.linspace(0, n_frames - 1, n_seg + 1)
    formants = np.stack(
        [np.interp(np.arange(n_frames), seg_pos, targets[:, j])
         for j in range(3)], axis=1)  # (n_frames, 3)
    formants *= rng.uniform(0.85, 1.15)  # talker vocal-tract scale

    # per-sample excitation
    out = np.zeros(n_frames * frame, np.float64)
    phase = 0.0
    zi = [np.zeros(2) for _ in range(3)]
    bws = (60.0, 90.0, 120.0)
    for i in range(n_frames):
        if voiced_f[i]:
            ph = phase + np.cumsum(np.full(frame, f0[i] / fs))
            exc = ((np.floor(ph) - np.floor(np.concatenate([[phase], ph[:-1]])))
                   > 0).astype(np.float64)  # impulse train
            phase = ph[-1] % 1e6
            exc += 0.08 * rng.standard_normal(frame)  # aspiration
        else:
            exc = 0.35 * rng.standard_normal(frame)
        x = exc
        for j in range(3):
            b, a = _resonator_coeffs(formants[i, j], bws[j], fs)
            x, zi[j] = lfilter(b, a, x, zi=zi[j])
        out[i * frame:(i + 1) * frame] = x * env_f[i]

    # lip radiation (first difference) + gentle lowpass via leaky integ.
    out = np.diff(out, prepend=0.0)
    peak = np.abs(out).max() + 1e-9
    wav = (out / peak * rng.uniform(0.15, 0.4)).astype(np.float32)
    text = " ".join(VOWEL_CHARS[j] for j in vowel_idx)
    return wav, text


def synth_noise(rng, n, fs, babble_fn=None):
    kind = rng.integers(0, 4)
    if kind == 0:      # white
        v = rng.standard_normal(n)
    elif kind == 1:    # pink-ish (leaky integrated white)
        v = lfilter([1.0], [1.0, -0.97], rng.standard_normal(n))
    elif kind == 2:    # amplitude-modulated white (machinery-like)
        f = rng.uniform(2.0, 20.0)
        v = rng.standard_normal(n) * (
            1.0 + 0.8 * np.sin(2 * np.pi * f * np.arange(n) / fs))
    else:              # babble: sum of 3 synthetic talkers
        v = sum(synth_speech(rng, n, fs)[0].astype(np.float64)
                for _ in range(3))
    v = v / (np.std(v) + 1e-9)
    return v.astype(np.float32)


def make_pair(seed, n, fs, snr_lo, snr_hi):
    rng = np.random.default_rng(seed)
    clean, text = synth_speech(rng, n, fs)
    noise = synth_noise(rng, len(clean), fs)
    snr = rng.uniform(snr_lo, snr_hi)
    sp = np.sqrt(np.mean(clean**2)) + 1e-9
    npow = np.sqrt(np.mean(noise**2)) + 1e-9
    noise = noise * (sp / npow) * 10 ** (-snr / 20.0)
    noisy = clean + noise
    peak = np.abs(noisy).max()
    if peak > 0.99:
        clean = clean * (0.99 / peak)
        noisy = noisy * (0.99 / peak)
    return noisy.astype(np.float32), clean, text


def _job(args):
    split_dir, idx, seed, n, fs, lo, hi, texts_only = args
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from open_universe_tpu.data.wavio import write_wav
    noisy, clean, text = make_pair(seed, n, fs, lo, hi)
    if not texts_only:
        write_wav(Path(split_dir) / "noisy" / f"u{idx:05d}.wav", noisy, fs)
        write_wav(Path(split_dir) / "clean" / f"u{idx:05d}.wav", clean, fs)
    (Path(split_dir) / "text" / f"u{idx:05d}.txt").write_text(text + "\n")
    return idx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--n-train", type=int, default=1500)
    ap.add_argument("--n-val", type=int, default=32)
    ap.add_argument("--n-test", type=int, default=24)
    ap.add_argument("--fs", type=int, default=16000)
    ap.add_argument("--dur", type=float, default=4.0)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--texts-only", action="store_true",
                    help="(re)write only the text/ transcripts for an "
                    "existing corpus — the synthesis is seed-deterministic "
                    "so the transcripts match the already-written wavs")
    args = ap.parse_args()

    n = int(args.fs * args.dur)
    jobs = []
    for split, count, lo, hi, base in [
            ("train", args.n_train, 2.5, 17.5, 0),
            ("val", args.n_val, 0.0, 15.0, 10**6),
            ("test", args.n_test, 0.0, 15.0, 2 * 10**6)]:
        sd = Path(args.out) / split
        (sd / "noisy").mkdir(parents=True, exist_ok=True)
        (sd / "clean").mkdir(parents=True, exist_ok=True)
        (sd / "text").mkdir(parents=True, exist_ok=True)
        for i in range(count):
            jobs.append((str(sd), i, base + i, n, args.fs, lo, hi,
                         args.texts_only))

    with ProcessPoolExecutor(max_workers=args.workers) as ex:
        for k, _ in enumerate(ex.map(_job, jobs, chunksize=16)):
            if (k + 1) % 200 == 0:
                print(f"{k + 1}/{len(jobs)}", flush=True)
    print(f"corpus written to {args.out} ({len(jobs)} pairs)")


if __name__ == "__main__":
    main()
