"""Character-level tokenizer for text conditioning.

The reference's text path uses OpenPhonemizer + PL-BERT's TextCleaner
symbol table (textencoder_11May.py:77-90) — external tools unavailable in
a zero-egress image. This self-contained tokenizer provides the same
interface (ids + padding mask, static max length for XLA); a phoneme
vocabulary can be dropped in via the ``vocab`` argument.
"""
import string
from typing import List, Sequence, Tuple

import numpy as np

PAD_ID = 0


class CharTokenizer:
    def __init__(self, vocab: str = None, max_len: int = 128):
        vocab = vocab or (string.ascii_lowercase + string.digits
                          + " .,!?'-")
        # id 0 is PAD
        self.stoi = {c: i + 1 for i, c in enumerate(vocab)}
        self.vocab_size = len(vocab) + 1
        self.max_len = max_len

    def __call__(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (ids (B, max_len) int32, pad_mask (B, max_len) bool
        True = PAD)."""
        b = len(texts)
        ids = np.full((b, self.max_len), PAD_ID, np.int32)
        for i, t in enumerate(texts):
            t = (t or "").strip().lower()[: self.max_len]
            for j, c in enumerate(t):
                ids[i, j] = self.stoi.get(c, PAD_ID)
        pad_mask = ids == PAD_ID
        return ids, pad_mask
