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
    def __init__(self, vocab: str = None, max_len: int = 128,
                 sil_token: bool = False):
        """``sil_token=True`` reproduces the reference's ``silsp`` variant
        (textencoder_11May_silsp.py:87-99, 200-201): a dedicated ``<sil>``
        token with its own id is PREPENDED to every sequence as an
        attention anchor. It is a real (non-PAD) token for the text
        encoder's self-attention, but downstream cross-attention must mask
        it out of the keys (see ``TextEncoder.sil_id``)."""
        vocab = vocab or (string.ascii_lowercase + string.digits
                          + " .,!?'-")
        # id 0 is PAD
        self.stoi = {c: i + 1 for i, c in enumerate(vocab)}
        self.sil_id = len(vocab) + 1 if sil_token else -1
        self.vocab_size = len(vocab) + 1 + (1 if sil_token else 0)
        self.max_len = max_len

    def __call__(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (ids (B, max_len) int32, pad_mask (B, max_len) bool
        True = PAD)."""
        b = len(texts)
        off = 1 if self.sil_id >= 0 else 0
        ids = np.full((b, self.max_len), PAD_ID, np.int32)
        if off:
            ids[:, 0] = self.sil_id
        for i, t in enumerate(texts):
            t = (t or "").strip().lower()[: self.max_len - off]
            for j, c in enumerate(t):
                ids[i, j + off] = self.stoi.get(c, PAD_ID)
        pad_mask = ids == PAD_ID
        return ids, pad_mask
