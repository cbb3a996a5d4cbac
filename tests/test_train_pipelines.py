"""Hyperparameter fan-out + distributed CRF training."""

import numpy as np
import pytest

from spacy_crfsuite_ray.core.extractor import CRFExtractor, gold_example_to_crf_tokens
from spacy_crfsuite_ray.core.features import sentence_to_tags
from spacy_crfsuite_ray.core.tokenizer import RegexTokenizer
from spacy_crfsuite_ray.pipelines.train import fine_tune, fit_distributed, sample_params


@pytest.fixture(scope="module")
def samples(restaurant_examples):
    tok = RegexTokenizer()
    return [
        gold_example_to_crf_tokens(dict(e), tokenizer=tok)
        for e in restaurant_examples
    ]


def test_sample_params_deterministic():
    assert sample_params(5) == sample_params(5)
    p = sample_params(10)
    assert all(x["c1"] > 0 and x["c2"] > 0 for x in p)


def test_fine_tune_returns_best(ray_session, samples):
    best, score, results = fine_tune(samples, cv=2, n_iter=4,
                                     base_config={"max_iter": 50})
    assert len(results) == 4
    assert best in [r["params"] for r in results]
    assert score == max(r["mean_score"] for r in results)
    assert 0.0 <= score <= 1.0


def test_fine_tune_serial_matches_ray(ray_session, samples):
    b1, s1, _ = fine_tune(samples, cv=2, n_iter=3, use_ray=True,
                          base_config={"max_iter": 40})
    b2, s2, _ = fine_tune(samples, cv=2, n_iter=3, use_ray=False,
                          base_config={"max_iter": 40})
    assert b1 == b2
    assert s1 == pytest.approx(s2)


def test_fit_distributed_matches_local(ray_session, samples):
    ext = CRFExtractor({"max_iter": 80, "c1": 0.003, "c2": 0.03})
    X = [ext.example_to_features(s) for s in samples]
    y = [sentence_to_tags(s) for s in samples]

    local = CRFExtractor({"max_iter": 80, "c1": 0.003, "c2": 0.03})
    local.train(samples)

    dist = fit_distributed(X, y, c1=0.003, c2=0.03, max_iterations=80,
                           n_chunks=4)
    assert dist.labels == local.ent_tagger.labels
    # same optimization on the same data → near-identical weights
    assert np.allclose(dist.W, local.ent_tagger.W, atol=1e-6)
    assert np.allclose(dist.T, local.ent_tagger.T, atol=1e-6)
    # and a perfect fit on the training set, like the reference gate
    ext_d = CRFExtractor(ent_tagger=dist)
    stats, _ = ext_d.eval(samples)
    assert stats["weighted avg"]["f1-score"] == pytest.approx(1.0)


def test_heldout_f1_floor():
    """Generalization gate: weighted F1 on template-DISJOINT dev data must
    clear a realistic floor (measured 0.976 at the defaults) — a tagger that
    merely memorizes training sentences fails this."""
    import __ray_entry__ as E

    df = E.queries()["tagger_report_heldout"]("/root/testdata/sf0.001")
    weighted = df[df["tag"] == "weighted avg"].iloc[0]
    assert weighted["f1"] >= 0.9
    assert int(weighted["support"]) > 100
