"""Token model.

Semantics follow the reference Token (see /root/reference/spacy_crfsuite/
tokenizer.py:8-49): text + char offsets [start, end), optional lemma, and a
``data`` dict carrying ``pos`` / ``shape`` / ``vector`` / ``pattern``.
Ordering/equality on (start, end, text, lemma). A ``__CLS__`` sentinel token is
appended after the last token at ``last.end + 1`` (tokenizer.py:86-88) and is
stripped before featurization everywhere.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

CLS_TOKEN = "__CLS__"


class Token:
    __slots__ = ("text", "start", "end", "lemma", "data")

    def __init__(
        self,
        text: str,
        start: int,
        end: Optional[int] = None,
        data: Optional[Dict[str, Any]] = None,
        lemma: Optional[str] = None,
    ) -> None:
        self.text = text
        self.start = start
        self.end = end if end else start + len(text)
        self.data = data if data else {}
        self.lemma = lemma or text

    def set(self, prop: str, info: Any) -> None:
        self.data[prop] = info

    def get(self, prop: str, default: Any = None) -> Any:
        return self.data.get(prop, default)

    def _key(self):
        return (self.start, self.end, self.text, self.lemma)

    def __eq__(self, other):
        if not isinstance(other, Token):
            return NotImplemented
        return self._key() == other._key()

    def __lt__(self, other):
        if not isinstance(other, Token):
            return NotImplemented
        return self._key() < other._key()

    def __hash__(self):
        return hash(self._key())

    def __repr__(self):
        return f"Token({self.text!r}, {self.start}, {self.end})"


def append_cls(tokens: list) -> list:
    """Append the ``__CLS__`` sentinel at ``last.end + 1`` (reference
    tokenizer.py:86-88). No-op on empty input."""
    if tokens:
        tokens.append(Token(CLS_TOKEN, tokens[-1].end + 1))
    return tokens


def tokens_without_cls(message: Dict) -> list:
    """Strip the trailing CLS sentinel (reference features.py:127-129).

    NOTE: the strip is unconditional, exactly like the reference — so
    pre-tokenized input that never had ``__CLS__`` appended (the CoNLL
    reader path) loses its LAST token and tag. This is deliberate reference
    parity (see tests/test_io_scheme_conll.py), documented also on the CoNLL
    reader; callers feeding their own pre-tokenized examples should append
    the sentinel via ``append_cls`` if they want the final token kept."""
    return message.get("tokens")[:-1]
