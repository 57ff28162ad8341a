"""Word error rate with wildcards.

Parity target: reference ``metrics/wer.py`` (normalize_sentence :34-88,
word_edit_distance :101-197, wer :200-214). The reference normalizes text
with OpenAI Whisper's ``EnglishTextNormalizer`` before a wildcard-aware
Levenshtein distance; the wildcard (e.g. ``<ignore/>``) absorbs any number
of inserted/deleted words at its location.

This implementation is self-contained: when the optional ``whisper``
package is present the exact same normalizer is used; otherwise a native
English normalizer implementing the same rule families (bracket removal,
hesitation removal, contraction expansion, punctuation stripping,
whitespace collapse) is applied. The wildcard DP itself is exact parity.
"""
import re
import string
from typing import Dict, List, Optional

PUNCTUATION = "[" + re.escape(string.punctuation) + "]"

# contraction / clitic expansions (subset of whisper's EnglishTextNormalizer
# replacement table; applied on lowercase text, word-bounded)
_CONTRACTIONS = {
    "won't": "will not",
    "can't": "can not",
    "shan't": "shall not",
    "let's": "let us",
    "ain't": "aint",
    "y'all": "you all",
    "wanna": "want to",
    "gonna": "going to",
    "gotta": "got to",
    "gimme": "give me",
    "lemme": "let me",
    "'cause": "because",
    "cos": "because",
    "coz": "because",
    "ma'am": "madam",
    "o'clock": "oclock",
}
_SUFFIX_RULES = [
    (re.compile(r"\b(\w+)n't\b"), r"\1 not"),
    (re.compile(r"\b(\w+)'re\b"), r"\1 are"),
    (re.compile(r"\b(\w+)'ve\b"), r"\1 have"),
    (re.compile(r"\b(\w+)'ll\b"), r"\1 will"),
    (re.compile(r"\b(\w+)'d\b"), r"\1 would"),
    (re.compile(r"\b(he|she|it|that|this|there|what|who|where|when|how)'s\b"),
     r"\1 is"),
]
_HESITATIONS = re.compile(
    r"\b(hmm+|mhm+|mm+|uh+|um+|huh|ah+|er+|erm)\b", flags=re.IGNORECASE
)


def _native_english_normalizer(text: str) -> str:
    """Native stand-in for whisper.normalizers.EnglishTextNormalizer.

    Implements the same rule families on lowercase English text; number
    and British-spelling canonicalization (dictionary-driven in whisper)
    are intentionally omitted — they need whisper's data files.
    """
    s = text.lower()
    s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)  # remove <tags> / [markers]
    s = re.sub(r"\(([^)]+?)\)", "", s)  # remove parenthesized remarks
    s = _HESITATIONS.sub("", s)
    for k, v in _CONTRACTIONS.items():
        s = re.sub(r"\b" + re.escape(k) + r"\b", v, s)
    for pat, rep in _SUFFIX_RULES:
        s = pat.sub(rep, s)
    s = re.sub(r"(\d),(\d)", r"\1\2", s)  # 1,000 -> 1000
    s = re.sub(r"'s\b", "", s)  # possessives
    s = re.sub(PUNCTUATION, " ", s)
    s = re.sub(r"\s+", " ", s).strip()
    return s


def _get_whisper_normalizer():
    try:
        from whisper.normalizers import EnglishTextNormalizer

        return EnglishTextNormalizer()
    except ImportError:
        return _native_english_normalizer


def normalize_sentence(
    sentence, wildcard: Optional[str] = None, style: str = "whisper"
) -> List[Optional[str]]:
    """Lowercase, strip punctuation, split into words; wildcard -> None.

    ``style="whisper"`` applies the English text normalizer (whisper's if
    installed, the native one otherwise); ``style="simple"`` is the
    reference's non-whisper path (per-word lowercase + punctuation strip).
    """
    if style == "whisper":
        textcleaner = _get_whisper_normalizer()
        sentence = sentence.lower()
        if wildcard is not None:
            wildcard = wildcard.lower()
            parts = [textcleaner(p) for p in sentence.split(wildcard)]
        else:
            parts = [textcleaner(sentence)]
        words: List[Optional[str]] = []
        for part in parts:
            words += part.split()
            words.append(None)
        words.pop()  # no trailing wildcard marker
    else:
        if not isinstance(sentence, list):
            sentence = sentence.split()
        words = []
        wildcard = wildcard.lower() if wildcard else None
        for word in sentence:
            word = word.lower()
            if wildcard and word == wildcard:
                words.append(None)
            else:
                words.append(re.sub(PUNCTUATION, "", word))
    return words


def word_edit_distance(
    sentence1,
    sentence2,
    wildcard: Optional[str] = None,
    style: str = "whisper",
):
    """Wildcard-aware word Levenshtein distance.

    The wildcard matches zero or more words for free. Returns
    ``(distance, n_words_1, n_words_2)`` with word counts excluding the
    wildcard (reference semantics, metrics/wer.py:141-197).
    """
    s1 = normalize_sentence(sentence1, wildcard=wildcard, style=style)
    s2 = normalize_sentence(sentence2, wildcard=wildcard, style=style)
    s1 = [w for w in s1 if w != ""]
    s2 = [w for w in s2 if w != ""]

    n1 = sum(w is not None for w in s1)
    n2 = sum(w is not None for w in s2)
    if len(s1) == 0:
        return n2, n1, n2
    if len(s2) == 0:
        return n1, n1, n2

    prev = [0] * (len(s2) + 1)
    for n in range(1, len(s2) + 1):
        prev[n] = prev[n - 1] + (s2[n - 1] is not None)
    for m in range(1, len(s1) + 1):
        cur = [prev[0] + (s1[m - 1] is not None)]
        for n in range(1, len(s2) + 1):
            if s1[m - 1] is None or s2[n - 1] is None:
                cur.append(min(prev[n], cur[n - 1]))
            elif s1[m - 1] == s2[n - 1]:
                cur.append(prev[n - 1])
            else:
                cur.append(1 + min(prev[n], cur[n - 1], prev[n - 1]))
        prev = cur
    return prev[-1], n1, n2


def wer(
    ref: List[str],
    hyp: List[str],
    wildcard: Optional[str] = None,
    style: str = "whisper",
) -> float:
    """Corpus WER: total edits / total reference words (metrics/wer.py:200)."""
    total_dist = 0
    total_words = 0
    for r, h in zip(ref, hyp):
        dist, n_ref, _ = word_edit_distance(r, h, wildcard=wildcard, style=style)
        total_dist += dist
        total_words += n_ref
    if total_words == 0:
        return 0.0
    return total_dist / total_words
