"""CRF numerics + BILOU decode goldens, incl. the two repair behaviors
(reference crf_extractor.py:343-502, FIXTURES.md F5)."""

import warnings

import numpy as np
import pytest

from spacy_crfsuite_ray.core.crf import LinearChainCRF
from spacy_crfsuite_ray.core.extractor import CRFExtractor
from spacy_crfsuite_ray.core.tokenizer import RegexTokenizer


def marginal(**probs):
    return probs


def make_message(text):
    msg = {"text": text}
    RegexTokenizer().tokenize(msg)
    return msg


def decode(msg, marginals, bilou=True):
    ext = CRFExtractor({"BILOU_flag": bilou})
    ext.ent_tagger = LinearChainCRF()  # decode never touches weights
    return ext.marginals_to_entities(msg, marginals)


def test_u_tag_single_token():
    msg = make_message("find chinese food")
    marginals = [
        marginal(O=0.9),
        {"U-cuisine": 0.6, "B-cuisine": 0.1, "O": 0.3},
        marginal(O=0.8),
    ]
    (ent,) = decode(msg, marginals)
    assert ent["value"] == "chinese"
    assert ent["entity"] == "cuisine"
    # BILOU confidence sums mass of same-entity tags: 0.6 + 0.1
    assert ent["confidence"] == pytest.approx(0.7)
    assert (ent["start"], ent["end"]) == (5, 12)


def test_bil_span_min_confidence_and_intertoken_text():
    msg = make_message("I love new   york pizza")
    marginals = [
        marginal(O=0.9),
        marginal(O=0.9),
        {"B-loc": 0.8, "O": 0.2},
        {"L-loc": 0.6, "O": 0.4},
        marginal(O=0.9),
    ]
    (ent,) = decode(msg, marginals)
    # span value preserves ORIGINAL inter-token whitespace
    assert ent["value"] == "new   york"
    assert ent["confidence"] == pytest.approx(0.6)  # min over span


def test_repair_mixed_classes_keeps_B_class():
    msg = make_message("a b c d")
    marginals = [
        {"B-x": 0.9},
        {"I-y": 0.7},
        {"L-x": 0.8},
        marginal(O=0.9),
    ]
    with pytest.warns(UserWarning, match="multiple entity classes"):
        (ent,) = decode(msg, marginals)
    assert ent["entity"] == "x"
    assert ent["value"] == "a b c"


def test_repair_unclosed_B_backs_up():
    msg = make_message("a b c")
    marginals = [
        {"B-x": 0.9},
        {"I-x": 0.8},
        {"O": 0.9},
    ]
    with pytest.warns(UserWarning, match="not closed"):
        (ent,) = decode(msg, marginals)
    assert ent["value"] == "a b"  # last tag treated as L-
    assert ent["entity"] == "x"


def test_simple_io_decode_splits_multiword():
    msg = make_message("new york")
    marginals = [{"loc": 0.9, "O": 0.1}, {"loc": 0.8, "O": 0.2}]
    ents = decode(msg, marginals, bilou=False)
    assert [e["value"] for e in ents] == ["new", "york"]
    assert ents[0]["confidence"] == pytest.approx(0.9)


def test_token_marginal_length_mismatch_raises():
    msg = make_message("a b")
    with pytest.raises(Exception, match="Inconsistency"):
        decode(msg, [marginal(O=1.0)])


def test_crf_fit_predict_roundtrip():
    # tiny deterministic corpus: label capitalized tokens as E
    X, y = [], []
    for words in [["Alice", "went", "home"], ["Bob", "ate", "Pizza"],
                  ["she", "met", "Carol"], ["dog", "saw", "Dave"]]:
        X.append([{"0:low": w.lower(), "0:title": w.istitle()} for w in words])
        y.append(["E" if w.istitle() else "O" for w in words])
    crf = LinearChainCRF().fit(X, y, c1=0.0, c2=0.01, max_iterations=100)
    pred = crf.predict_single(
        [{"0:low": "eve", "0:title": True}, {"0:low": "ran", "0:title": False}]
    )
    assert pred == ["E", "O"]
    margs = crf.predict_marginals_single(
        [{"0:low": "eve", "0:title": True}]
    )
    assert margs[0]["E"] > 0.5
    assert sum(margs[0].values()) == pytest.approx(1.0)


def test_crf_save_load_roundtrip(tmp_path):
    X = [[{"a": True}], [{"b": True}]]
    y = [["X"], ["O"]]
    crf = LinearChainCRF().fit(X, y, max_iterations=50)
    path = str(tmp_path / "model.npz")
    crf.save(path)
    loaded = LinearChainCRF.load(path)
    assert loaded.labels == crf.labels
    assert np.allclose(loaded.W, crf.W)
    assert loaded.predict_single([{"a": True}]) == crf.predict_single([{"a": True}])


def test_viterbi_uses_transitions():
    # state scores prefer O everywhere, but transitions force alternation
    crf = LinearChainCRF()
    crf.labels = ["A", "B"]
    crf.vocab = {"f": 0}
    crf.W = np.array([[0.1, 0.0]])
    crf.T = np.array([[-5.0, 5.0], [5.0, -5.0]])
    tags = crf.predict_single([{"f": True}] * 4)
    assert tags in (["A", "B", "A", "B"], ["B", "A", "B", "A"])
