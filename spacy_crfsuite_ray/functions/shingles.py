"""Vectorized word-k-gram shingling over Arrow string columns.

The scalar twin is ``functions.hashing.word_shingles`` (reference
semantics: ASCII ``\\s+`` split, empties dropped, docs with
0 < words < k contribute ONE whole-text shingle, wordless docs
contribute nothing). These kernels produce the identical shingles for
every row of a column with no per-token Python: Arrow's RE2 split is
byte-identical to DuckDB's ``regexp_split_to_array(text, '\\s+')`` in
the shared oracle CTEs, window construction is offset arithmetic over
the flattened word stream, and the k-way string join is
``pc.binary_join_element_wise``.
"""
from typing import Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_EMPTY_STR = pa.array([], pa.string())
_EMPTY_I64 = np.empty(0, np.int64)


def split_words(text_col) -> Tuple[pa.Array, np.ndarray, np.ndarray]:
    """Whitespace-split a string column, dropping empties.

    Returns ``(flat, doc_of_word, counts)``: the flattened word stream
    (doc-contiguous, batch row order), each word's row index, and the
    per-row word count. Nulls count as empty text.
    """
    n = len(text_col)
    if n == 0:
        return _EMPTY_STR, _EMPTY_I64, _EMPTY_I64
    lst = pc.split_pattern_regex(pc.coalesce(text_col, ""), r"\s+")
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    raw_counts = lst.value_lengths().to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    flat = lst.flatten()
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    doc_of_word = np.repeat(np.arange(n), raw_counts)[keep_np]
    flat = flat.filter(keep)
    counts = np.bincount(doc_of_word, minlength=n).astype(np.int64)
    return flat, doc_of_word, counts


def shingle_occurrences(
    text_col, k: int
) -> Tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray]:
    """Every word-k-gram occurrence of every doc in the column.

    Returns ``(sh, doc_of, start, counts)``:

    - ``sh``: shingle strings (all long docs' k-gram windows first, then
      short docs' whole-text shingles — runs of equal ``doc_of`` are
      per-doc, but NOT sorted by doc value)
    - ``doc_of``: row index into ``text_col`` per shingle (int64)
    - ``start``: 0-based word position of each window (0 for whole-text
      shingles)
    - ``counts``: per-row word count after the empty drop
    """
    flat, _, counts = split_words(text_col)
    n = len(counts)
    if n == 0:
        return _EMPTY_STR, _EMPTY_I64, _EMPTY_I64, counts
    offs = np.concatenate([[0], np.cumsum(counts)])
    total = int(offs[-1])

    grams, gram_docs, gram_starts = [], [], []
    long_mask = counts >= k
    if long_mask.any():
        n_g = counts - (k - 1)
        pos = np.arange(total, dtype=np.int64)
        local = pos - np.repeat(offs[:-1], counts)
        win = (local < np.repeat(n_g, counts)) & np.repeat(
            long_mask, counts
        )
        starts = pos[win]
        parts = [flat.take(pa.array(starts + j, pa.int64()))
                 for j in range(k)]
        joined = parts[0]
        for piece in parts[1:]:
            joined = pc.binary_join_element_wise(joined, piece, " ")
        grams.append(joined)
        gram_docs.append(
            np.repeat(np.nonzero(long_mask)[0], n_g[long_mask])
        )
        gram_starts.append(local[win])
    short_mask = (counts > 0) & (counts < k)
    short = np.nonzero(short_mask)[0]
    if len(short):
        idx = np.nonzero(np.repeat(short_mask, counts))[0]
        sub = pa.ListArray.from_arrays(
            pa.array(
                np.concatenate([[0], np.cumsum(counts[short])]), pa.int32()
            ),
            flat.take(pa.array(idx, pa.int64())),
        )
        grams.append(pc.binary_join(sub, " "))
        gram_docs.append(short)
        gram_starts.append(np.zeros(len(short), np.int64))
    if not grams:
        return _EMPTY_STR, _EMPTY_I64, _EMPTY_I64, counts
    sh = pa.concat_arrays(
        [g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
         for g in grams]
    )
    return (
        sh,
        np.concatenate(gram_docs).astype(np.int64),
        np.concatenate(gram_starts).astype(np.int64),
        counts,
    )


def shingle_set_rows(
    text_col, k: int
) -> Tuple[pa.Array, np.ndarray, np.ndarray]:
    """Each doc's UNIQUE shingles: ``(sh, doc_of, set_size)`` where
    ``set_size[i]`` is the full unique-shingle count of ``doc_of[i]``'s
    doc (carried per row, `_ngram_explode`-style). Row order follows the
    per-batch Arrow group_by — callers must not assume doc contiguity.
    """
    sh, doc_of, _, counts = shingle_occurrences(text_col, k)
    if len(sh) == 0:
        return sh, doc_of, _EMPTY_I64
    u = (
        pa.table({"d": pa.array(doc_of, pa.int64()), "sh": sh})
        .group_by(["d", "sh"])
        .aggregate([])
    )
    d = u.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
    sz = np.bincount(d, minlength=len(counts)).astype(np.int64)[d]
    return u.column("sh").combine_chunks(), d, sz
