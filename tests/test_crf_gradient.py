"""Numerical gradient check: the analytic CRF gradient must match finite
differences — guards the forward-backward/expected-counts implementation."""

import numpy as np
import pytest

from spacy_crfsuite_ray.core.crf import LinearChainCRF


@pytest.fixture(scope="module")
def setup():
    X = [
        [{"a": True, "w": 0.5}, {"b": True}, {"a": True, "c": "x"}],
        [{"b": True}, {"c": "y", "w": 2.0}],
        [{"a": True}],
    ]
    y = [["O", "E", "O"], ["E", "O"], ["E"]]
    crf = LinearChainCRF()
    # build vocab/labels by a tiny fit (1 iteration)
    crf.fit(X, y, c1=0.0, c2=0.0, max_iterations=1)
    encs = []
    lab_idx = {lab: i for i, lab in enumerate(crf.labels)}
    for sent, tags in zip(X, y):
        enc = crf._encode(sent, grow_vocab=False)
        enc.labels = np.asarray([lab_idx[t] for t in tags], dtype=np.int64)
        encs.append(enc)
    return crf, encs


def test_analytic_gradient_matches_finite_differences(setup):
    crf, encs = setup
    F, L = len(crf.vocab), len(crf.labels)
    rng = np.random.RandomState(3)
    W = rng.normal(scale=0.3, size=(F, L))
    T = rng.normal(scale=0.3, size=(L, L))

    nll, gW, gT = crf._nll_grad(encs, W, T)
    assert np.isfinite(nll)

    eps = 1e-6
    for arr, grad in ((W, gW), (T, gT)):
        flat = arr.ravel()
        gflat = grad.ravel()
        for idx in rng.choice(flat.size, size=min(12, flat.size), replace=False):
            orig = flat[idx]
            flat[idx] = orig + eps
            nll_p, _, _ = crf._nll_grad(encs, W, T)
            flat[idx] = orig - eps
            nll_m, _, _ = crf._nll_grad(encs, W, T)
            flat[idx] = orig
            numeric = (nll_p - nll_m) / (2 * eps)
            assert numeric == pytest.approx(gflat[idx], abs=1e-4), idx


def test_marginals_sum_to_one_and_positive(setup):
    crf, encs = setup
    feats = [{"a": True}, {"b": True, "w": 1.5}, {"c": "x"}]
    margs = crf.predict_marginals_single(feats)
    for row in margs:
        total = sum(row.values())
        assert total == pytest.approx(1.0)
        assert all(v >= 0 for v in row.values())


def test_viterbi_is_argmax_sequence(setup):
    """Viterbi path must score >= every other label sequence."""
    import itertools

    crf, _ = setup
    feats = [{"a": True}, {"b": True}, {"c": "y"}]
    enc = crf._encode(feats, grow_vocab=False)
    S = crf._state_scores(enc)

    def score(path):
        s = sum(S[t, j] for t, j in enumerate(path))
        s += sum(crf.T[path[t - 1], path[t]] for t in range(1, len(path)))
        return s

    best = crf.predict_single(feats)
    best_idx = [crf.labels.index(lab) for lab in best]
    L = len(crf.labels)
    for path in itertools.product(range(L), repeat=3):
        assert score(best_idx) >= score(list(path)) - 1e-9
