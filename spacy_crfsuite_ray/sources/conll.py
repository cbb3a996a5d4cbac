"""CoNLL-02/03 gold-annotation reader.

Semantics match /root/reference/spacy_crfsuite/conll.py:8-85: blank line ends a
sentence block; ``-DOCSTART-`` and ``#`` lines are skipped; 3 columns =
CoNLL-02 ``(word, pos, tag)``, 4 columns = CoNLL-03 ``(word, pos, chunk, tag)``;
tokens at cumulative offsets ``idx += len(word) + 1``; every non-O tag becomes
a single-token entity dict; text = space-join of the words.

KNOWN REFERENCE QUIRK (preserved deliberately): downstream featurization
strips the trailing ``__CLS__`` sentinel UNCONDITIONALLY
(core/tokens.py:tokens_without_cls), but pre-tokenized CoNLL examples never
receive the sentinel — so each sentence's LAST token and its gold tag are
dropped during training/eval, exactly as in the reference
(tests/test_io_scheme_conll.py pins this behavior).
"""

from __future__ import annotations

from typing import Dict, Iterator, List

from ..core.bilou import NO_ENTITY_TAG
from ..core.tokens import Token


def parse_conll_block(buff: List[List[str]]) -> Dict:
    tokens: List[Token] = []
    entities: List[Dict] = []
    idx = 0
    for i, pieces in enumerate(buff):
        if len(pieces) == 3:
            word, pos, tag = pieces
        elif len(pieces) == 4:
            word, pos, _chunk, tag = pieces
        else:
            raise ValueError(f"Could not parse CoNLL line: {buff[i]}")
        tok = Token(word, idx, data={"pos": pos})
        tokens.append(tok)
        idx += len(word) + 1
        if tag != NO_ENTITY_TAG:
            entities.append(
                {"value": tok.text, "entity": tag, "start": tok.start, "end": tok.end}
            )
    return {
        "text": " ".join(t.text for t in tokens),
        "tokens": tokens,
        "entities": entities,
    }


def parse_conll(lines) -> Iterator[Dict]:
    buf: List[List[str]] = []
    for line in lines:
        if line.strip() == "" and not line.startswith(("-DOCSTART-", "#")):
            if buf:
                yield parse_conll_block(buf)
                buf = []
        elif line.startswith("-DOCSTART-") or line.startswith("#"):
            continue
        else:
            stripped = line.rstrip()
            if stripped:
                buf.append(stripped.split())
    if buf:
        yield parse_conll_block(buf)


def read_conll(path: str) -> Iterator[Dict]:
    with open(path, "r", encoding="utf-8") as f:
        yield from parse_conll(f)
