"""Fast batched tagging path == reference-semantics per-sentence path."""

import numpy as np
import pytest

from spacy_crfsuite_ray.core.fast_tag import FastTagger, config_is_cacheable
from spacy_crfsuite_ray.core.tokenizer import RegexTokenizer
from spacy_crfsuite_ray.sources.pages import _page_rows
from spacy_crfsuite_ray.core.sentences import split_sentences
from spacy_crfsuite_ray.stages.tag import tag_sentences
from spacy_crfsuite_ray.state.model import ensure_default_model, load_extractor


@pytest.fixture(scope="module")
def model():
    return load_extractor(ensure_default_model())


@pytest.fixture(scope="module")
def corpus():
    sents = []
    for i in range(150):
        r = _page_rows(i)
        if r["lang"] == "en":
            sents.extend(s for _, s in split_sentences(r["text"]))
    return sents


def test_config_cacheable(model):
    assert config_is_cacheable(model.component_config["features"])
    assert not config_is_cacheable([["low"], ["low", "dense_features"], ["low"]])


def test_fast_equals_slow_on_corpus(model, corpus):
    fast = FastTagger(model)
    got = fast.tag_texts(corpus)
    want = tag_sentences(model, RegexTokenizer(), corpus)
    n_ents = 0
    for g, w, sent in zip(got, want, corpus):
        assert len(g) == len(w), sent
        for ge, we in zip(g, w):
            assert (ge["start"], ge["end"], ge["value"], ge["entity"]) == (
                we["start"], we["end"], we["value"], we["entity"]), sent
            assert ge["confidence"] == pytest.approx(we["confidence"], abs=1e-9)
            n_ents += 1
    assert n_ents > 300  # the corpus genuinely exercises the tagger


def test_fast_handles_empty_and_whitespace(model):
    fast = FastTagger(model)
    out = fast.tag_texts(["", "   ", "Alice Martin works at Acme Corp."])
    assert out[0] == [] and out[1] == []
    assert len(out[2]) == 2


def test_fast_marginals_match_slow(model, corpus):
    fast = FastTagger(model)
    sent = corpus[0]
    spans = [(t, s, e) for t, s, e in
             __import__("spacy_crfsuite_ray.core.tokenizer",
                        fromlist=["span_tokenize"]).span_tokenize(sent)]
    enc = fast.encode_sentence([t for t, _, _ in spans])
    S = fast._state_scores_batch([enc])
    marg = fast.marginals_batch(S)[0]
    # slow path marginals
    msg = {"text": sent}
    RegexTokenizer().tokenize(msg)
    crf_tokens = model.featurizer(msg)
    feats = model.example_to_features(crf_tokens)
    slow = model.ent_tagger.predict_marginals_single(feats)
    assert marg.shape[0] == len(slow)
    for t, row in enumerate(slow):
        for j, lab in enumerate(model.ent_tagger.labels):
            assert marg[t, j] == pytest.approx(row[lab], abs=1e-9)
