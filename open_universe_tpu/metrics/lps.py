"""Levenshtein phoneme similarity (LPS).

Parity target: reference ``LevenshteinPhonemeSimilarity``
(metrics/lps.py:50-156): greedy-CTC phoneme strings from
wav2vec2-lv-60-espeak-cv-ft for estimate and reference, then
``LPS = 1 - levenshtein(est, ref) / len(ref)``.

Native parts: the Levenshtein distance (the reference uses the
``Levenshtein`` C package) and greedy CTC collapse are implemented here;
the phoneme predictor itself needs local wav2vec2 weights (zero-egress
image) or any user-supplied callable ``waveform -> phoneme sequence``.
"""
import math
from typing import Callable, Optional, Sequence

import numpy as np

WAV2VEC2_SR = 16000


def levenshtein(a: Sequence, b: Sequence) -> int:
    """Plain edit distance over arbitrary symbol sequences."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def ctc_greedy_collapse(ids: np.ndarray, blank_id: int = 0) -> list:
    """argmax-CTC decode: merge repeats, drop blanks."""
    out = []
    prev = None
    for t in np.asarray(ids).reshape(-1):
        if t != prev and t != blank_id:
            out.append(int(t))
        prev = t
    return out


class CTCPhonemePredictor:
    """Greedy phoneme decoding with a local Flax wav2vec2 CTC model.

    Mirrors the reference ``PhonemePredictor`` (metrics/lps.py:50-95) but
    runs the backbone through JAX so it XLA-compiles on TPU.
    """

    def __init__(self, model_path: str = "facebook/wav2vec2-lv-60-espeak-cv-ft"):
        from ..losses.phoneme import _load_flax_wav2vec2

        self.model = _load_flax_wav2vec2(model_path, for_ctc=True)
        self.sr = WAV2VEC2_SR

    def __call__(self, waveform) -> list:
        import jax.numpy as jnp

        x = jnp.asarray(np.asarray(waveform, np.float32).reshape(1, -1))
        x = (x - x.mean()) / (x.std() + 1e-7)  # Wav2Vec2Processor norm
        logits = self.model(x).logits
        ids = np.asarray(logits.argmax(-1))[0]
        return ctc_greedy_collapse(ids, blank_id=0)


class LevenshteinPhonemeSimilarity:
    """LPS = 1 - levenshtein(phon(est), phon(ref)) / len(phon(ref)).

    ``predictor`` is any callable mapping a 1-D waveform at 16 kHz to a
    phoneme sequence (list/str); defaults to the wav2vec2 CTC predictor
    (requires local weights).
    """

    def __init__(self, sr: int = WAV2VEC2_SR,
                 predictor: Optional[Callable] = None,
                 model_path: str = "facebook/wav2vec2-lv-60-espeak-cv-ft"):
        self.sr = sr
        self.predictor = predictor or CTCPhonemePredictor(model_path)

    def _resample(self, x):
        x = np.asarray(x, np.float32).reshape(-1)
        if self.sr == WAV2VEC2_SR:
            return x
        from scipy.signal import resample_poly

        g = math.gcd(self.sr, WAV2VEC2_SR)
        return resample_poly(x, WAV2VEC2_SR // g, self.sr // g)

    def __call__(self, sample, reference) -> float:
        est_ph = self.predictor(self._resample(sample))
        ref_ph = self.predictor(self._resample(reference))
        if isinstance(est_ph, str):
            est_ph = est_ph.replace(" ", "")
        if isinstance(ref_ph, str):
            ref_ph = ref_ph.replace(" ", "")
        if len(ref_ph) == 0:
            return float("nan")
        return 1.0 - levenshtein(est_ph, ref_ph) / len(ref_ph)
