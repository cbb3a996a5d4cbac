"""Stateless extraction stages: HTML→text and page→sentence explosion.

Both run as plain ``map_batches`` tasks (no state), ``batch_format="pyarrow"``.
The work is per-row regex over large strings — genuinely row-wise compute, not
a vectorizable kernel — so the Python loop here IS the hot compute, and blocks
stream through with backpressure.
"""

from __future__ import annotations

from typing import List

import pyarrow as pa

from ..core.html import extract_text
from ..core.sentences import split_sentences


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """(url, warc_ts, html, lang) → (url, lang, text). Drops ``html`` as early
    as possible so downstream blocks don't carry page bytes."""
    texts = [extract_text(h) for h in batch.column("html").to_pylist()]
    return pa.table(
        {
            "url": batch.column("url"),
            "lang": batch.column("lang"),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def filter_lang(batch: pa.Table, lang: str = "en") -> pa.Table:
    import pyarrow.compute as pc

    return batch.filter(pc.equal(batch.column("lang"), lang))


def explode_sentences(batch: pa.Table) -> pa.Table:
    """(url, text) → one row per sentence: (url, sent_idx, base, sent).
    Splitting EARLY equalizes row sizes so giant pages never create giant
    rows (SURVEY.md §4 skew row)."""
    urls: List[str] = []
    idxs: List[int] = []
    bases: List[int] = []
    sents: List[str] = []
    for url, text in zip(
        batch.column("url").to_pylist(), batch.column("text").to_pylist()
    ):
        for i, (base, sent) in enumerate(split_sentences(text)):
            urls.append(url)
            idxs.append(i)
            bases.append(base)
            sents.append(sent)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "sent_idx": pa.array(idxs, type=pa.int32()),
            "base": pa.array(bases, type=pa.int32()),
            "sent": pa.array(sents, type=pa.string()),
        }
    )
