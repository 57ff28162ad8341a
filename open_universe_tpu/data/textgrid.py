"""TextGrid (Praat / Montreal Forced Aligner) parsing + aligned dataset.

Parity target: reference ``dataset_aligned`` package
(dataset_aligned/static_dataset_aligned3.py:107-130): parse MFA
``.TextGrid`` word/phone interval tiers per utterance and emit aligned
text blocks for conditioning.
"""
import re
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from .dataset import NoisyDataset


def parse_textgrid(path) -> Dict[str, List[Tuple[float, float, str]]]:
    """Parse a (long-form) TextGrid into {tier_name: [(t0, t1, label)]}.

    Supports the standard MFA output format.
    """
    text = Path(path).read_text(errors="replace")
    tiers = {}
    # split on 'item [n]:' blocks
    items = re.split(r"item\s*\[\d+\]:", text)[1:]
    for item in items:
        m = re.search(r'name\s*=\s*"([^"]*)"', item)
        if not m:
            continue
        name = m.group(1)
        intervals = []
        for im in re.finditer(
                r"intervals\s*\[\d+\]:\s*"
                r"xmin\s*=\s*([\d.eE+-]+)\s*"
                r"xmax\s*=\s*([\d.eE+-]+)\s*"
                r'text\s*=\s*"([^"]*)"', item):
            t0, t1, label = float(im.group(1)), float(im.group(2)), im.group(3)
            intervals.append((t0, t1, label))
        tiers[name] = intervals
    return tiers


def alignment_to_frames(intervals, n_frames: int, frame_rate: float,
                        vocab: Optional[dict] = None):
    """Expand (t0, t1, label) intervals to a per-frame label id array.

    frame_rate: frames per second. Unknown labels and silence map to 0.
    """
    ids = np.zeros(n_frames, np.int32)
    for t0, t1, label in intervals:
        if not label.strip():
            continue
        lo = int(round(t0 * frame_rate))
        hi = min(int(round(t1 * frame_rate)), n_frames)
        if vocab is not None:
            ids[lo:hi] = vocab.get(label, 0)
        else:
            ids[lo:hi] = 1
    return ids


def token_alignment_coords(word_intervals, text: str, tokenizer,
                           duration: Optional[float] = None):
    """Per-token normalized time spans from a TextGrid word tier.

    Parity target: the reference's TextGrid-supervised conditioning
    (textencoder_14May_xph2_tg2.py:126-199 ``align_phonemes_from_textgrid``
    + condition_11May2_silsp_tg.py:659-685): every conditioning token gets
    a normalized [xmin, xmax] span; leading/trailing silence spans are
    attached to the silence anchor; tokens without an alignment get a zero
    span (skipped by the alignment loss). The reference aligns espeak
    phonemes to MFA phones; our tokens are characters, so each word's
    span is split linearly over its characters and inter-word spaces get
    the gap between words (documented deviation — same supervision
    granularity at word level).

    Returns (coords (max_len, 2) float32 in fractions of ``duration``,
    valid (max_len,) bool).
    """
    words = [(t0, t1, w.strip().lower()) for t0, t1, w in word_intervals
             if w.strip()]
    if duration is None:
        duration = max((t1 for _, t1, _ in word_intervals), default=0.0)
    max_len = tokenizer.max_len
    coords = np.zeros((max_len, 2), np.float32)
    valid = np.zeros(max_len, bool)
    if duration <= 0:
        return coords, valid

    off = 1 if getattr(tokenizer, "sil_id", -1) >= 0 else 0
    if off and words:
        # leading silence span -> the <sil> anchor token (add_sil=True,
        # textencoder_14May_xph2_tg2.py:192-199)
        coords[0] = (0.0, words[0][0] / duration)
        valid[0] = True

    # walk the normalized text exactly as CharTokenizer lays it out
    text_norm = (text or "").strip().lower()[: max_len - off]
    # map every character position to its word index (None for spaces)
    spans = []  # per char: (t0, t1) or None
    wi = 0
    ci = 0  # char position inside current word
    for ch in text_norm:
        if ch.isspace():
            # gap between word wi-1 and wi
            prev_end = words[wi - 1][1] if 0 < wi <= len(words) else None
            nxt_start = words[wi][0] if wi < len(words) else None
            if prev_end is not None and nxt_start is not None:
                spans.append((prev_end, nxt_start))
            else:
                spans.append(None)
            ci = 0
            continue
        if wi < len(words):
            t0, t1, w = words[wi]
            n = max(len(w), 1)
            k = min(ci, n - 1)
            dt = (t1 - t0) / n
            spans.append((t0 + k * dt, t0 + (k + 1) * dt))
            ci += 1
            if ci >= len(w):
                wi += 1
                ci = 0
        else:
            spans.append(None)

    for j, sp in enumerate(spans):
        if sp is not None and j + off < max_len:
            coords[j + off] = (sp[0] / duration, sp[1] / duration)
            valid[j + off] = True
    return coords, valid


class AlignedNoisyDataset(NoisyDataset):
    """NoisyDataset + per-utterance TextGrid alignments.

    __getitem__ additionally returns {"words": [...], "phones": [...],
    "text": str} parsed from <textgrid_path>/<key>.TextGrid.
    """

    def __init__(self, *args, textgrid_path=None, word_tier="words",
                 phone_tier="phones", tokenizer=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.textgrid_path = Path(textgrid_path) if textgrid_path else None
        self.word_tier = word_tier
        self.phone_tier = phone_tier
        self.tokenizer = tokenizer

    def token_coords(self, key: str):
        """(coords (max_len, 2), valid (max_len,)) forced-alignment spans
        for the tokenized utterance text, or all-invalid when no TextGrid
        or tokenizer is available (the alignment loss skips those)."""
        if self.tokenizer is None:
            raise ValueError("token_coords needs a tokenizer")
        align = self.alignment(key)
        if align is None:
            L = self.tokenizer.max_len
            return (np.zeros((L, 2), np.float32), np.zeros(L, bool))
        return token_alignment_coords(align["words"], align["text"],
                                      self.tokenizer)

    def alignment(self, key: str):
        if self.textgrid_path is None:
            return None
        p = self.textgrid_path / f"{key}.TextGrid"
        if not p.exists():
            return None
        tiers = parse_textgrid(p)
        words = tiers.get(self.word_tier, [])
        phones = tiers.get(self.phone_tier, [])
        return {
            "words": words,
            "phones": phones,
            "text": " ".join(w for _, _, w in words if w.strip()),
        }

    def __getitem__(self, idx):
        out = super().__getitem__(idx)
        key = Path(self.file_list[idx]).stem
        align = self.alignment(key)
        if align is not None and self.split != "test":
            noisy, clean, txt, mask = out
            return noisy, clean, align["text"] or txt, mask
        return out
