"""Feature-dict goldens for the default window config
(reference crf_extractor.py:513-549, FIXTURES.md F4)."""

import numpy as np

from spacy_crfsuite_ray.core.extractor import CRFExtractor, gold_example_to_crf_tokens
from spacy_crfsuite_ray.core.features import Featurizer, Pooling
from spacy_crfsuite_ray.core.tokenizer import RegexTokenizer
from spacy_crfsuite_ray.core.crf import flatten_features


def featurize(text):
    ex = {"text": text}
    crf_tokens = gold_example_to_crf_tokens(ex, tokenizer=RegexTokenizer())
    ext = CRFExtractor()
    return ext.example_to_features(crf_tokens)


def test_window_keys_and_bos_eos():
    feats = featurize("show me Pizza")
    # token 0: BOS flag, no -1: keys
    assert feats[0]["BOS"] is True
    assert not any(k.startswith("-1:") for k in feats[0])
    assert feats[0]["0:low"] == "show"
    assert feats[0]["1:low"] == "me"
    # middle token has both neighbors
    assert feats[1]["-1:low"] == "show"
    assert feats[1]["1:low"] == "pizza"
    assert feats[1]["-1:title"] is False
    assert feats[1]["1:title"] is True
    # last token: EOS flag
    assert feats[2]["EOS"] is True
    assert feats[2]["0:low"] == "pizza"
    assert feats[2]["0:prefix5"] == "Pizza"
    assert feats[2]["0:prefix2"] == "Pi"
    assert feats[2]["0:suffix3"] == "zza"
    assert feats[2]["0:bias"] == "bias"
    assert feats[2]["0:title"] is True
    assert feats[2]["0:digit"] is False
    assert feats[2]["0:shape"] == "Xxxxx"


def test_single_token_sentence_has_both_flags():
    feats = featurize("hello")
    assert feats[0]["BOS"] is True and feats[0]["EOS"] is True


def test_gold_tags_default_na():
    ex = {"text": "hello world"}
    crf_tokens = gold_example_to_crf_tokens(ex, tokenizer=RegexTokenizer())
    # no gold entities → BILOU gives O (not N/A, since entities list applied)
    assert [t.entity for t in crf_tokens] == ["O", "O"]
    # predict-time featurizer without entities gives N/A
    assert [t.entity for t in Featurizer()(ex)] == ["N/A", "N/A"]


def test_dense_features_alignment_and_pooling():
    vecs = {"hello": np.array([1.0, 0.0]), "world": np.array([0.0, 1.0])}
    ex = {"text": "hello world"}
    RegexTokenizer(vectors=vecs).tokenize(ex)
    f = Featurizer(use_dense_features=True)
    dense = f.get_dense_features(ex)
    assert len(dense) == 3  # 2 tokens + CLS pooled row
    assert dense[0]["text_dense_features"]["0"] == 1.0
    assert dense[2]["text_dense_features"]["0"] == 0.5  # mean pooling
    # missing vectors → alignment guard returns None
    ex2 = {"text": "hello world"}
    RegexTokenizer(vectors={"hello": np.array([1.0, 0.0])}).tokenize(ex2)
    assert f.get_dense_features(ex2) is None


def test_max_pooling():
    feats = np.array([[1.0, 0.0], [0.0, 2.0]])
    out = Featurizer._calculate_cls_vector(feats, Pooling.MAX)
    assert out.tolist() == [[1.0, 2.0]]


def test_flatten_features_pycrfsuite_semantics():
    flat = dict(flatten_features({
        "0:low": "pizza", "0:title": True, "0:digit": False,
        "0:dense": {"text_dense_features": {"0": 0.25}},
        "num": 3,
    }))
    assert flat["0:low=pizza"] == 1.0
    assert flat["0:title"] == 1.0
    assert "0:digit" not in flat  # zero-weight dropped
    assert flat["0:dense:text_dense_features:0"] == 0.25
    assert flat["num"] == 3.0
