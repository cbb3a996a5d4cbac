"""Text-analysis operators over the ``documents`` table.

Every SQL-oracled op is defined so the EXACT same semantics are expressible in
DuckDB (token pattern = the engine tokenizer's single regex, counts via
pyarrow.compute vectorized kernels — no Python loop in the hot path).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..core.tokenizer import TOKEN_PATTERN


def _docs(sf_dir: str, columns=None) -> "rd.Dataset":
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def doc_stats(sf_dir: str) -> "rd.Dataset":
    """Per-doc stats: n_chars / n_tokens / n_upper / n_digit — all vectorized
    Arrow kernels (count_substring_regex matches re.findall counts)."""

    def stats(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(text, TOKEN_PATTERN), pa.int64()
                ),
                "n_upper": pc.cast(
                    pc.count_substring_regex(text, "[A-Z]"), pa.int64()
                ),
                "n_digit": pc.cast(
                    pc.count_substring_regex(text, "[0-9]"), pa.int64()
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


def lang_count(sf_dir: str) -> "rd.Dataset":
    ds = _docs(sf_dir, ["lang"]).groupby("lang").count()
    return ds.map_batches(
        lambda b: b.rename_columns(["lang", "n_docs"]), batch_format="pyarrow"
    )


def token_count_by_source(sf_dir: str) -> "rd.Dataset":
    """Pre-aggregated combiner: per-batch token sums, then a tiny groupby —
    the shuffle moves one row per (batch, source), not per document."""

    def partial(batch: pa.Table) -> pa.Table:
        counts = pc.cast(
            pc.count_substring_regex(batch.column("text"), TOKEN_PATTERN),
            pa.int64(),
        )
        t = pa.table({"source": batch.column("source"), "c": counts})
        return t.group_by("source").aggregate([("c", "sum")]).rename_columns(
            ["source", "c"]
        )

    ds = (
        _docs(sf_dir, ["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .sum("c")
    )
    return ds.map_batches(
        lambda b: b.rename_columns(["source", "total_tokens"]),
        batch_format="pyarrow",
    )


def quality_filter(sf_dir: str, min_chars: int = 150, max_chars: int = 1000,
                   min_tokens: int = 30) -> "rd.Dataset":
    """Documents passing simple quality gates (SQL-mirrorable)."""

    def fil(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_tokens = pc.cast(
            pc.count_substring_regex(text, TOKEN_PATTERN), pa.int64()
        )
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(n_chars, min_chars),
                pc.less_equal(n_chars, max_chars),
            ),
            pc.greater_equal(n_tokens, min_tokens),
        )
        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": n_chars,
                "n_tokens": n_tokens,
            }
        )
        return out.filter(mask)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fil, batch_format="pyarrow"
    )


def doc_fingerprint(sf_dir: str) -> "rd.Dataset":
    """doc_id → md5(text) — matches DuckDB md5() for the oracle."""

    def fp(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import text_md5

        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fp": pa.array(
                    [text_md5(t) for t in batch.column("text").to_pylist()],
                    pa.string(),
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow"
    )


# ---------------------------------------------------------------- language ID

_LANG_PROFILES = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
           "with", "on", "this", "be", "are"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "mit", "von",
           "zu", "den", "war", "nicht", "auf"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "un", "une", "dans",
           "que", "pour", "pas", "au"},
    "es": {"el", "la", "los", "las", "de", "y", "es", "un", "una", "en",
           "que", "por", "con", "no"},
}


def detect_lang(text: str) -> str:
    """Deterministic heuristic language ID: CJK char detection, then stopword
    profile vote (ties broken by fixed profile order)."""
    if any("一" <= ch <= "鿿" for ch in text[:400]):
        return "zh"
    words = set(text.lower().split()[:200])
    best, best_score = "und", 0
    for lang in ("en", "de", "fr", "es"):
        score = len(words & _LANG_PROFILES[lang])
        if score > best_score:
            best, best_score = lang, score
    return best


def lang_id(sf_dir: str) -> "rd.Dataset":
    """n-gram/stopword-heuristic language ID (non-SQL op → rows-only check)."""

    def ident(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(
                    [detect_lang(t) for t in batch.column("text").to_pylist()],
                    pa.string(),
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ident, batch_format="pyarrow"
    )


_STOPWORDS = _LANG_PROFILES["en"]


def quality_score(sf_dir: str) -> "rd.Dataset":
    """Richer quality metrics (stopword ratio, mean token length, composite
    score) — rows-only check (not cleanly SQL-expressible)."""
    import re

    tok_re = re.compile(TOKEN_PATTERN)

    def score(batch: pa.Table) -> pa.Table:
        doc_ids, alpha_r, stop_r, mean_len, scores = [], [], [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            tokens = tok_re.findall(text)
            n = len(tokens) or 1
            alpha = sum(1 for t in tokens if t.isalpha()) / n
            stop = sum(1 for t in tokens if t.lower() in _STOPWORDS) / n
            mlen = sum(len(t) for t in tokens) / n
            s = 0.5 * alpha + 0.3 * min(stop * 5, 1.0) + 0.2 * min(mlen / 8, 1.0)
            doc_ids.append(doc_id)
            alpha_r.append(round(alpha, 6))
            stop_r.append(round(stop, 6))
            mean_len.append(round(mlen, 6))
            scores.append(round(s, 6))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "alpha_ratio": pa.array(alpha_r, pa.float64()),
                "stopword_ratio": pa.array(stop_r, pa.float64()),
                "mean_token_len": pa.array(mean_len, pa.float64()),
                "quality": pa.array(scores, pa.float64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )
