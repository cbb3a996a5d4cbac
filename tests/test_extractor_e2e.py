"""End-to-end tagger quality gate: F1 = 1.0 on the restaurant-style gold set,
mirroring /root/reference/README.md:110-122 (FIXTURES.md F7)."""

import pytest

from spacy_crfsuite_ray.core.extractor import CRFExtractor
from spacy_crfsuite_ray.core.tokenizer import RegexTokenizer


def test_train_eval_f1_is_1(trained_extractor):
    ext, samples = trained_extractor
    stats, text = ext.eval(samples)
    assert stats["weighted avg"]["f1-score"] == pytest.approx(1.0)
    assert stats["micro avg"]["support"] == 21  # gold tags in the fixture set


def test_label_ordering_in_report(trained_extractor):
    ext, samples = trained_extractor
    labels = [lab for lab in ext.ent_tagger.classes_ if lab != "O"]
    labels.sort(key=lambda name: (name[1:], name[0]))
    # entity-then-prefix ordering (reference crf_extractor.py:220)
    assert labels == sorted(labels, key=lambda n: (n[1:], n[0]))
    assert labels[0].endswith("cuisine")


def test_process_finds_entities(trained_extractor):
    ext, _ = trained_extractor
    ex = {"text": "show me chinese restaurants in the north"}
    RegexTokenizer().tokenize(ex)
    ents = ext.process(ex)
    assert [(e["value"], e["entity"]) for e in ents] == [
        ("chinese", "cuisine"),
        ("north", "location"),
    ]
    for e in ents:
        assert 0.5 < e["confidence"] <= 1.0
    # offsets index into the original text
    assert ex["text"][ents[0]["start"]:ents[0]["end"]] == "chinese"


def test_multiword_entity_span(trained_extractor):
    ext, _ = trained_extractor
    ex = {"text": "I am looking for asian fusion food"}
    RegexTokenizer().tokenize(ex)
    ents = ext.process(ex)
    assert ("asian fusion", "cuisine") in [(e["value"], e["entity"]) for e in ents]


def test_unfitted_raises():
    with pytest.raises(RuntimeError):
        CRFExtractor().process({"text": "x"})


def test_explain_lists_weights(trained_extractor):
    ext, _ = trained_extractor
    text = ext.explain(n=3)
    assert "Most likely transitions" in text
    assert "Positive features" in text
