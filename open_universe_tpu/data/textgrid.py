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


class AlignedNoisyDataset(NoisyDataset):
    """NoisyDataset + per-utterance TextGrid alignments.

    __getitem__ additionally returns {"words": [...], "phones": [...],
    "text": str} parsed from <textgrid_path>/<key>.TextGrid.
    """

    def __init__(self, *args, textgrid_path=None, word_tier="words",
                 phone_tier="phones", **kwargs):
        super().__init__(*args, **kwargs)
        self.textgrid_path = Path(textgrid_path) if textgrid_path else None
        self.word_tier = word_tier
        self.phone_tier = phone_tier

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
