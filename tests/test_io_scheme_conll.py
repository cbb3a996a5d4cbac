"""IO-tag-scheme (bilou=False) and CoNLL pre-tokenized training paths."""

import pytest

from spacy_crfsuite_ray.core.extractor import CRFExtractor, gold_example_to_crf_tokens
from spacy_crfsuite_ray.core.tokenizer import RegexTokenizer
from spacy_crfsuite_ray.sources.conll import parse_conll

CONLL = """Alice NNP B-PER
Martin NNP I-PER
works VBZ O
at IN O
Acme NNP B-ORG
Corp NNP I-ORG
. . O

Bob NNP B-PER
visited VBD O
Lakeside NNP B-LOC
. . O

Carol NNP B-PER
Okafor NNP I-PER
joined VBD O
Initech NNP B-ORG
Labs NNP I-ORG
. . O
"""


@pytest.fixture(scope="module")
def conll_samples():
    examples = list(parse_conll(CONLL.splitlines(keepends=True)))
    # pre-tokenized path: gold tags carried as IO entities, bilou=False
    return [
        gold_example_to_crf_tokens(dict(e), bilou=False) for e in examples
    ]


def test_conll_pretokenized_drops_last_token(conll_samples):
    # reference quirk: tokens[:-1] stripping removes the final CoNLL token
    # (no __CLS__ was appended) — parity is intentional
    assert [t.text for t in conll_samples[1]] == ["Bob", "visited", "Lakeside"]


def test_io_scheme_train_and_simple_decode(conll_samples):
    ext = CRFExtractor({"BILOU_flag": False, "c1": 0.01, "c2": 0.01,
                        "max_iter": 120,
                        "features": [["low", "title", "upper"],
                                     ["low", "bias", "prefix5", "prefix2",
                                      "suffix5", "suffix3", "suffix2",
                                      "upper", "title", "digit", "shape",
                                      "pos", "pos2"],
                                     ["low", "title", "upper"]]})
    ext.train(conll_samples)
    assert all(not lab.startswith(("U-", "L-"))
               for lab in ext.ent_tagger.classes_)
    stats, _ = ext.eval(conll_samples)
    assert stats["weighted avg"]["f1-score"] == pytest.approx(1.0)

    # simple IO decode splits multi-word entities per token
    ex = {"text": "Alice Martin works at Acme Corp"}
    RegexTokenizer().tokenize(ex)
    ents = ext.process(ex)
    assert [e["entity"] for e in ents] == ["B-PER", "I-PER", "B-ORG", "I-ORG"]
    assert [e["value"] for e in ents] == ["Alice", "Martin", "Acme", "Corp"]
