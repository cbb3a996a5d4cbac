"""BILOU round-trip goldens (reference bilou.py:52-99 semantics)."""

from spacy_crfsuite_ray.core.bilou import (
    bilou_prefix_from_tag,
    bilou_tags_from_offsets,
    entity_name_from_tag,
    remove_bilou_prefixes,
)
from spacy_crfsuite_ray.core.tokens import Token


def toks(*words):
    out, idx = [], 0
    for w in words:
        out.append(Token(w, idx))
        idx += len(w) + 1
    return out


def test_single_token_entity_is_U():
    tokens = toks("show", "chinese", "food")
    tags = bilou_tags_from_offsets(tokens, [(5, 12, "cuisine")])
    assert tags == ["O", "U-cuisine", "O"]


def test_multi_token_entity_is_BIL():
    tokens = toks("mexican", "indian", "fusion", "now")
    tags = bilou_tags_from_offsets(tokens, [(0, 21, "cuisine")])
    assert tags == ["B-cuisine", "I-cuisine", "L-cuisine", "O"]


def test_misaligned_offsets_stay_O():
    tokens = toks("hello", "world")
    # end falls inside a token → no tags assigned
    tags = bilou_tags_from_offsets(tokens, [(0, 4, "x")])
    assert tags == ["O", "O"]


def test_prefix_helpers_and_removal():
    assert bilou_prefix_from_tag("B-loc") == "B"
    assert bilou_prefix_from_tag("O") is None
    assert entity_name_from_tag("L-loc") == "loc"
    assert entity_name_from_tag("O") == "O"
    tags = ["B-a", "I-a", "L-a", "O", "U-b"]
    remove_bilou_prefixes(tags)
    assert tags == ["a", "a", "a", "O", "b"]
