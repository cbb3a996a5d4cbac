"""Deterministic sentence splitting.

Splitting pages into per-sentence rows EARLY is the scale lever (SURVEY.md §4:
giant pages must not become giant rows) — block sizes equalize and the CRF
actor pool sees bounded sequences. A crfsuite-style max-length guard truncates
pathological sentences; truncation is surfaced in metrics, never silent.
"""

from __future__ import annotations

import re
from typing import Iterator, List, Tuple

# split after ./!/? (optionally followed by closing quotes/brackets) + spaces,
# but only when the next sentence starts with a capital/digit/quote — avoids
# splitting at abbreviation periods like "Acme Corp. acquired ..."
_SENT_RE = re.compile(r"(?<=[.!?])[\)\]\"']*\s+(?=[A-Z0-9\"'(\[])")

MAX_SENT_CHARS = 2000  # guard: one sentence row never exceeds this


def split_sentences(text: str) -> List[Tuple[int, str]]:
    """Return (char_offset, sentence) pairs. Newlines are hard boundaries."""
    out: List[Tuple[int, str]] = []
    for para_off, para in _iter_paragraphs(text):
        start = 0
        for m in _SENT_RE.finditer(para):
            sent = para[start:m.start() + _closing_len(para, m)]
            if sent.strip():
                out.extend(_capped(para_off + start, sent))
            start = m.end()
        tail = para[start:]
        if tail.strip():
            out.extend(_capped(para_off + start, tail))
    return out


def _closing_len(para: str, m) -> int:
    # include trailing quote/bracket chars that precede the whitespace
    return len(m.group(0)) - len(m.group(0).lstrip("\"')]"))


def _iter_paragraphs(text: str) -> Iterator[Tuple[int, str]]:
    off = 0
    for part in text.split("\n"):
        if part.strip():
            yield off, part
        off += len(part) + 1


def _capped(offset: int, sent: str) -> Iterator[Tuple[int, str]]:
    while len(sent) > MAX_SENT_CHARS:
        yield offset, sent[:MAX_SENT_CHARS]
        offset += MAX_SENT_CHARS
        sent = sent[MAX_SENT_CHARS:]
    yield offset, sent
