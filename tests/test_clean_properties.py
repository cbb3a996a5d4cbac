"""Property-based tests (hypothesis) for the cleaning-op batch kernels —
run directly on Arrow tables (no Ray session needed), against naive Python
references. These harden the semantics the DuckDB oracle tests assert only
on fixed fixtures: arbitrary newline placement, repeated lines, unicode,
PII-lookalike digit runs."""

import hashlib
import re

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from spacy_crfsuite_ray.ops.clean import (
    NORM_WS,
    PII_EMAIL,
    PII_IPV4,
    PII_PHONE,
    PII_REDACTIONS,
    _dedup_lines_frame,
)

# a PII-rich alphabet: letters, digits, separators the patterns key on,
# plus newlines/tabs and some unicode
pii_alphabet = st.sampled_from(
    list("abcXYZ0123456789@.-_ \t\n") + ["é", "中"]
)
pii_text = st.text(alphabet=pii_alphabet, max_size=200)
doc_lists = st.lists(pii_text, min_size=1, max_size=8)


def _batch(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


@settings(max_examples=150, deadline=None)
@given(doc_lists)
def test_dedup_lines_frame_matches_naive(texts):
    rows = _dedup_lines_frame(_batch(texts))
    got = {}
    if rows is not None:
        idx, cleaned, n_kept, n_removed = rows
        got = {
            int(i): (c, int(k), int(r))
            for i, c, k, r in zip(idx, cleaned, n_kept, n_removed)
        }
    for i, t in enumerate(texts):
        lines = t.split("\n")
        seen, kept = set(), []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        want = ("\n".join(kept), len(kept), len(lines) - len(kept))
        assert got[i] == want, (t, got.get(i), want)


@settings(max_examples=150, deadline=None)
@given(pii_text)
def test_pii_patterns_match_python_re(text):
    """Arrow's RE2 count/replace kernels agree with Python re for the PII
    patterns (these patterns use only constructs with identical semantics
    in both engines: classes, \\b, \\d, bounded repeats)."""
    import pyarrow.compute as pc

    arr = pa.array([text], pa.string())
    for pattern in [PII_EMAIL, PII_IPV4, PII_PHONE]:
        got = pc.count_substring_regex(arr, pattern)[0].as_py()
        assert got == len(re.findall(pattern, text)), (pattern, text)
    redacted = arr
    expected = text
    for pattern, token in PII_REDACTIONS:
        redacted = pc.replace_substring_regex(redacted, pattern, token)
        expected = re.sub(pattern, token, expected)
    assert redacted[0].as_py() == expected


@settings(max_examples=150, deadline=None)
@given(pii_text)
def test_normalization_matches_python_re(text):
    """The norm_dedup normalization chain (lower -> \\s+ collapse -> trim
    spaces) agrees with the Python re reference; the md5 over it is then
    engine-independent by construction."""
    import pyarrow.compute as pc

    arr = pa.array([text], pa.string())
    got = pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(arr), NORM_WS, " "), " "
    )[0].as_py()
    want = re.sub(NORM_WS, " ", text.lower()).strip(" ")
    assert got == want
    assert (
        hashlib.md5(got.encode()).hexdigest()
        == hashlib.md5(want.encode()).hexdigest()
    )


@settings(max_examples=100, deadline=None)
@given(doc_lists)
def test_chunk_text_rows_matches_naive(texts):
    """The list-offset chunk explode equals the naive per-doc slicing for
    arbitrary word/space layouts (k=3 keeps examples small)."""
    from spacy_crfsuite_ray.ops.dedup import _chunk_text_rows

    rows = _chunk_text_rows(_batch(texts), 3)
    got = []
    if rows is not None:
        doc_of, cidx, chunk_text = rows
        got = [
            (int(d), int(c), t)
            for d, c, t in zip(doc_of, cidx, chunk_text.to_pylist())
        ]
    want = []
    for i, t in enumerate(texts):
        words = t.split(" ")
        for j in range(len(words) // 3):
            want.append((i, j, " ".join(words[j * 3:(j + 1) * 3])))
    assert got == want
