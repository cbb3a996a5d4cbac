"""Tokenizer goldens, ported from /root/reference/tests/test_tokenizer.py:4-12."""

import numpy as np

from spacy_crfsuite_ray.core.tokenizer import RegexTokenizer, pos_of, word_shape
from spacy_crfsuite_ray.core.tokens import CLS_TOKEN


def test_hello_world_offsets():
    msg = {"text": "hello world"}
    RegexTokenizer().tokenize(msg)
    toks = msg["tokens"]
    assert [t.text for t in toks] == ["hello", "world", CLS_TOKEN]
    assert (toks[0].start, toks[0].end) == (0, 5)
    assert (toks[1].start, toks[1].end) == (6, 11)
    assert toks[2].start == toks[1].end + 1  # CLS at last.end + 1


def test_punctuation_peeling():
    msg = {"text": "Could I pay in yen?"}
    RegexTokenizer().tokenize(msg)
    texts = [t.text for t in msg["tokens"][:-1]]
    assert texts == ["Could", "I", "pay", "in", "yen", "?"]
    assert msg["tokens"][-2].start == 18


def test_shape_and_pos():
    assert word_shape("Apple") == "Xxxxx"
    assert word_shape("ABC123") == "XXXddd"
    assert word_shape("aaaaaaaa") == "xxxx"  # runs capped at 4
    assert pos_of("The") == "DT"
    assert pos_of("123") == "CD"
    assert pos_of("London") == "NNP"
    assert pos_of(".") == "."


def test_vectors_attached_when_table_given():
    vectors = {"hello": np.ones(4, dtype=np.float32)}
    msg = {"text": "hello world"}
    RegexTokenizer(vectors=vectors).tokenize(msg)
    assert msg["tokens"][0].get("vector") is not None
    assert msg["tokens"][1].get("vector") is None
