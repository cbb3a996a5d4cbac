"""Deterministic regex tokenizer (the engine's replacement for spaCy).

spaCy is unavailable in this environment (see SURVEY.md preamble), so the
engine ships its own deterministic tokenizer producing the same Token surface
the reference consumes (/root/reference/spacy_crfsuite/tokenizer.py:64-89):
char offsets into the original text, ``pos`` and ``shape`` in ``data``, and a
trailing ``__CLS__`` sentinel.

The token pattern is intentionally a SINGLE regex findall (``\\w+|[^\\w\\s]``)
so the exact same tokenization is expressible in DuckDB via
``regexp_extract_all`` — that is what makes the Ray-vs-SQL oracle comparisons
in ``__ray_entry__.py`` possible.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from .tokens import Token, append_cls

TOKEN_PATTERN = r"\w+|[^\w\s]"
_TOKEN_RE = re.compile(TOKEN_PATTERN, re.UNICODE)

# tiny deterministic closed-class POS rules — pos only feeds optional CRF
# features (reference uses spaCy tag_ the same way, tokenizer.py:74)
_CLOSED = {
    "the": "DT", "a": "DT", "an": "DT", "this": "DT", "that": "DT",
    "of": "IN", "in": "IN", "on": "IN", "at": "IN", "by": "IN", "for": "IN",
    "with": "IN", "from": "IN", "to": "IN", "as": "IN", "into": "IN",
    "is": "VBZ", "are": "VBP", "was": "VBD", "were": "VBD", "be": "VB",
    "been": "VBN", "has": "VBZ", "have": "VBP", "had": "VBD",
    "and": "CC", "or": "CC", "but": "CC",
    "he": "PRP", "she": "PRP", "it": "PRP", "they": "PRP", "we": "PRP",
    "i": "PRP", "you": "PRP", "who": "WP", "which": "WDT",
    "not": "RB", "no": "DT",
}


def pos_of(text: str) -> str:
    low = text.lower()
    if low in _CLOSED:
        return _CLOSED[low]
    if not text[:1].isalnum():
        return text[:1]  # punctuation tags itself, PTB-style
    if text.isdigit():
        return "CD"
    if low.endswith("ing"):
        return "VBG"
    if low.endswith("ed"):
        return "VBD"
    if low.endswith("ly"):
        return "RB"
    if text[:1].isupper():
        return "NNP"
    if low.endswith("s") and len(low) > 3:
        return "NNS"
    return "NN"


def word_shape(text: str) -> str:
    """spaCy-like shape: upper→X, lower→x, digit→d, other kept; runs of the
    same shape char are capped at 4."""
    out = []
    last = ""
    run = 0
    for ch in text:
        if ch.isalpha():
            s = "X" if ch.isupper() else "x"
        elif ch.isdigit():
            s = "d"
        else:
            s = ch
        if s == last:
            run += 1
        else:
            run = 1
            last = s
        if run <= 4:
            out.append(s)
    return "".join(out)


def span_tokenize(text: str) -> List[Tuple[str, int, int]]:
    """(token_text, start, end) triples; offsets are char offsets."""
    return [(m.group(), m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]


class Tokenizer:
    """Extension surface (reference tokenizer.py:52-57): subclass and
    implement ``tokenize(message, attribute)``; every caller accepts any
    Tokenizer."""

    def tokenize(self, message: Dict, attribute: str = "text") -> None:
        raise NotImplementedError("should be implemented by subclass")


class RegexTokenizer(Tokenizer):
    """Drop-in for the reference ``SpacyTokenizer``: mutates ``message`` in
    place, adding ``tokens`` (with CLS sentinel)."""

    def __init__(self, vectors: Optional[Dict[str, "object"]] = None):
        # optional word→np.ndarray table standing in for spaCy vectors
        self.vectors = vectors

    def tokenize(self, message: Dict, attribute: str = "text") -> None:
        text = message[attribute]
        tokens = [
            Token(t, s, e, data={"pos": pos_of(t), "shape": word_shape(t)})
            for t, s, e in span_tokenize(text)
        ]
        if self.vectors is not None:
            for tok in tokens:
                vec = self.vectors.get(tok.text)
                if vec is not None:
                    tok.set("vector", vec)
        append_cls(tokens)
        message["tokens"] = tokens
