"""Metric tests: LSD, STOI/ESTOI behavior, SDRs, wrappers."""
import numpy as np
import pytest

from open_universe_tpu.metrics import (
    EvalMetrics,
    Metrics,
    log_spectral_distance,
    sdr,
    si_sdr,
    stoi,
)

FS = 16000


def _speechlike(seconds=2.0, seed=0):
    """Modulated multi-tone with per-band distinct envelopes (ESTOI needs
    spectro-temporal diversity — a shared envelope is degenerate under its
    row/column normalization)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * FS)) / FS
    x = 0.0
    for i, f in enumerate([220, 440, 880, 1760, 2500]):
        env = 0.5 * (1 + np.sin(2 * np.pi * (2 + 1.3 * i) * t
                                + rng.uniform(0, 6)))
        x = x + env * np.sin(2 * np.pi * f * t + rng.uniform(0, 6))
    return (x / 5).astype(np.float64)


def test_lsd_zero_for_identical():
    x = _speechlike()
    d = log_spectral_distance(x[None], x[None])
    assert float(d[0]) < 1e-6


def test_lsd_increases_with_noise():
    x = _speechlike()
    rng = np.random.default_rng(1)
    d1 = float(log_spectral_distance((x + 0.01 * rng.standard_normal(len(x)))[None],
                                     x[None])[0])
    d2 = float(log_spectral_distance((x + 0.3 * rng.standard_normal(len(x)))[None],
                                     x[None])[0])
    assert 0 < d1 < d2


@pytest.mark.parametrize("extended", [False, True])
def test_stoi_clean_is_high(extended):
    x = _speechlike()
    v = stoi(x, x, FS, extended=extended)
    assert v > 0.95, v


@pytest.mark.parametrize("extended", [False, True])
def test_stoi_monotonic_in_snr(extended):
    x = _speechlike()
    rng = np.random.default_rng(2)
    noise = rng.standard_normal(len(x))
    vals = []
    for snr_db in [20, 5, -5]:
        g = np.linalg.norm(x) / np.linalg.norm(noise) * 10 ** (-snr_db / 20)
        vals.append(stoi(x + g * noise, x, FS, extended=extended))
    assert vals[0] > vals[1] > vals[2], vals


def test_sdr_metrics():
    x = _speechlike()
    rng = np.random.default_rng(3)
    noisy = x + 0.1 * rng.standard_normal(len(x))
    assert float(si_sdr(x, x)) > 50
    assert 0 < float(si_sdr(noisy, x)) < 30
    assert abs(float(si_sdr(2 * noisy, x)) - float(si_sdr(noisy, x))) < 0.01
    assert float(sdr(noisy, x)) > 0


def test_metrics_wrapper():
    x = _speechlike()
    rng = np.random.default_rng(4)
    noisy = x + 0.05 * rng.standard_normal(len(x))
    m = Metrics(["si-sdr", "lsd", "si-lsd", "stoi-ext", "sdr"])
    out = m(noisy, x, FS, key="a")
    assert set(out) == {"si-sdr", "lsd", "si-lsd", "stoi-ext", "sdr"}
    assert out["si-sdr"] > 10


def test_eval_metrics():
    x = np.stack([_speechlike(seed=i) for i in range(2)])
    rng = np.random.default_rng(5)
    noisy = x + 0.05 * rng.standard_normal(x.shape)
    ev = EvalMetrics(audio_fs=FS)
    out = ev(noisy, x)
    assert "lsd" in out and "si-sdr" in out and "estoi" in out
    # synthetic multi-tone scores lower than real speech; just require
    # clearly-intelligible territory
    assert out["estoi"] > 0.4


def test_async_eval_metrics():
    """Async wrapper returns the same dicts as inline computation and
    surfaces worker exceptions on drain()."""
    from open_universe_tpu.metrics.eval import AsyncEvalMetrics

    x = np.stack([_speechlike(seed=i) for i in range(2)])
    rng = np.random.default_rng(5)
    noisy = x + 0.05 * rng.standard_normal(x.shape)
    ev = EvalMetrics(audio_fs=FS)

    aev = AsyncEvalMetrics(ev)
    aev.submit(noisy, x)
    aev.submit(noisy, x)
    results = aev.drain()
    assert len(results) == 2
    inline = ev(noisy, x)
    for r in results:
        assert set(r) == set(inline)
        np.testing.assert_allclose(r["si-sdr"], inline["si-sdr"], rtol=1e-6)

    # errors propagate
    def bad(est, ref):
        raise ValueError("boom")
    aev2 = AsyncEvalMetrics(bad)
    aev2.submit(noisy, x)
    try:
        aev2.drain()
        raised = False
    except ValueError:
        raised = True
    assert raised
    aev2.close()
    aev.close()


def test_wer_wildcard_edit_distance():
    from open_universe_tpu.metrics.wer import wer, word_edit_distance

    # the reference's own self-test cases (metrics/wer.py:226-243)
    wc = "<ignore/>"
    assert word_edit_distance("hello robin!", "hello robin!", wildcard=wc)[0] == 0
    assert word_edit_distance("hello robin!", "hello robin", wildcard=wc)[0] == 0
    assert word_edit_distance("hello robin!", "hello <ignore/> robin", wildcard=wc)[0] == 0
    assert word_edit_distance("hello robin!", "hello <ignore/>", wildcard=wc)[0] == 0
    d, n1, n2 = word_edit_distance(
        "hello <ignore/> robin", "hello robin shark", wildcard=wc)
    assert d == 1 and n1 == 2 and n2 == 3
    # wildcard absorbs multiple words
    assert word_edit_distance("hello <ignore/>", "hello robin shark west",
                              wildcard=wc)[0] == 0


def test_wer_corpus_and_normalizer():
    from open_universe_tpu.metrics.wer import wer

    refs = ["the cat sat on the mat", "i won't go"]
    hyps = ["the cat sat on the mat", "i will not go"]
    assert wer(refs, hyps) == 0.0
    # one substitution over 6+4=10 ref words (won't -> will not makes 4)
    hyps2 = ["the dog sat on the mat", "i will not go"]
    assert abs(wer(refs, hyps2) - 1 / 10) < 1e-9
    # punctuation / case insensitive; empty-vs-nonempty counts all words
    assert wer(["Hello, World!"], ["hello world"]) == 0.0
    assert wer(["a b c"], [""]) == 1.0


def test_native_pesq_behavioral_anchors():
    from open_universe_tpu.metrics.pesq import native_pesq

    def speechlike_h(fs, seconds=3.0, seed=0):
        rng = np.random.default_rng(seed)
        t = np.arange(int(fs * seconds)) / fs
        ph = np.cumsum(2 * np.pi * 120 * (1 + 0.1 * np.sin(2 * np.pi * 2.1 * t)) / fs)
        x = sum(np.sin(h * ph) / h for h in range(1, 12))
        x = x * np.clip(np.sin(2 * np.pi * 1.5 * t), 0, None)
        x = x + 0.001 * rng.standard_normal(len(t))
        return (x / np.abs(x).max() * 0.3).astype(np.float32)

    for fs, mode, mx in ((16000, "wb", 4.64), (8000, "nb", 4.55)):
        x = speechlike_h(fs)
        # identity -> max MOS-LQO; invariant to gain and small delay
        assert abs(native_pesq(fs, x, x, mode) - mx) < 0.02
        assert abs(native_pesq(fs, x, 0.5 * x, mode) - mx) < 0.02
        shifted = np.concatenate([np.zeros(100, np.float32), x])
        assert abs(native_pesq(fs, x, shifted, mode) - mx) < 0.02
        # monotone in SNR, spanning the scale
        noise = np.random.default_rng(1).standard_normal(len(x)).astype(np.float32)
        scores = []
        for snr in (40, 20, 0):
            g = np.sqrt((x**2).mean() / (noise**2).mean()) * 10 ** (-snr / 20)
            scores.append(native_pesq(fs, x, x + g * noise, mode))
        assert scores[0] > scores[1] > scores[2]
        assert scores[0] > 3.5 and scores[2] < 1.6


def test_pesq_in_metrics_wrapper():
    x = _speechlike()
    m = Metrics(["pesq-wb", "si-sdr"])
    out = m(x, x, FS, key="a")
    assert out["pesq-wb"] > 4.5


def test_lps_with_stub_predictor():
    from open_universe_tpu.metrics.lps import (
        LevenshteinPhonemeSimilarity, ctc_greedy_collapse, levenshtein)

    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein([1, 2, 3], [1, 3]) == 1
    assert ctc_greedy_collapse([0, 5, 5, 0, 3, 3, 3, 0, 5], 0) == [5, 3, 5]

    # stub predictor: one phoneme per quartile keyed off local energy
    def stub(x):
        n = len(x) // 4
        return [int(np.mean(x[i * n:(i + 1) * n] ** 2) > 4.0)
                for i in range(4)]

    lps = LevenshteinPhonemeSimilarity(predictor=stub)
    x = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    assert lps(x, x) == 1.0
    assert lps(-x, x) == 1.0  # identical energies -> same stub phonemes
    # louder second half flips 2 of 4 phonemes -> similarity drops
    y = x.copy()
    y[8000:] *= 3.0
    assert lps(y, x) < 1.0


def test_native_pesq_variable_delay_and_warp():
    """P.862 time-alignment structure (native/pesq.cpp): constant delays
    of any size are removed exactly by the aligner; a piecewise delay
    change (time warp) placed in silence is recovered by the windowed
    delay track + changepoint walk (the utterance-splitting capability),
    leaving the score at the identity ceiling."""
    from open_universe_tpu.metrics.pesq import native_pesq

    fs = 16000
    rng = np.random.default_rng(3)
    t = np.arange(int(fs * 3.0)) / fs
    ph = np.cumsum(2 * np.pi * 120 *
                   (1 + 0.1 * np.sin(2 * np.pi * 2.1 * t)) / fs)
    x = sum(np.sin(h * ph) / h for h in range(1, 12))
    gate = np.clip(np.sin(2 * np.pi * 1.0 * t), 0, None)  # 0.5 s silences
    x = (x * gate + 1e-4 * rng.standard_normal(len(t))).astype(np.float32)
    x = (x / np.abs(x).max() * 0.3).astype(np.float32)
    ident = native_pesq(fs, x, x, "wb")
    assert ident > 4.6

    # constant 300 ms delay: exact removal
    sh = np.concatenate([np.zeros(int(0.3 * fs), np.float32), x])
    assert abs(native_pesq(fs, x, sh, "wb") - ident) < 0.02

    # piecewise warp: +40 ms inserted inside a silent trough mid-signal
    mid = int(1.5 * fs)  # sin(2*pi*1.0*1.5s) = 0 -> silence region
    pw = np.concatenate([x[:mid], np.zeros(int(0.04 * fs), np.float32),
                         x[mid:]])
    assert abs(native_pesq(fs, x, pw, "wb") - ident) < 0.1

    # delay map diagnostic: the map must change value near the warp point
    import ctypes

    from open_universe_tpu.metrics.pesq import _LIB_PATH
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.pesq_delay_map.restype = ctypes.c_int32
    lib.pesq_delay_map.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int64)]
    out = np.zeros(len(x), np.int64)
    lib.pesq_delay_map(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        pw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pw),
        fs, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    assert out[len(x) // 10] == 0            # before the warp
    assert out[-len(x) // 10] == int(0.04 * fs)  # after the warp
