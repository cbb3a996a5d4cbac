"""Numpy linear-chain CRF: training (L-BFGS), Viterbi, forward-backward marginals.

The reference delegates these numerics to the python-crfsuite C extension via
sklearn_crfsuite (/root/reference/spacy_crfsuite/compat.py:4-208); that library
is unavailable here, so this is a from-scratch implementation of the published
linear-chain CRF algorithms (Lafferty et al. 2001; Nocedal L-BFGS). What must
match the reference is the *decoded spans*, not the weights (SURVEY.md §7.3).

Feature-dict encoding mirrors pycrfsuite's ItemSequence semantics:
- str value        → attribute "key=value", weight 1.0
- bool             → attribute "key", weight 1.0 / 0.0
- int/float        → attribute "key", weight float(value)
- nested dict      → recurse with "key:subkey"
Zero-weight attributes are dropped (mathematically identical).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

NEG_INF = -1e30


def flatten_features(fd: Dict[str, Any], prefix: str = "") -> List[Tuple[str, float]]:
    out: List[Tuple[str, float]] = []
    for key, value in fd.items():
        name = f"{prefix}{key}"
        if isinstance(value, bool):
            if value:
                out.append((name, 1.0))
        elif isinstance(value, str):
            out.append((f"{name}={value}", 1.0))
        elif isinstance(value, dict):
            out.extend(flatten_features(value, prefix=f"{name}:"))
        elif value is None:
            continue
        elif isinstance(value, (int, float, np.floating, np.integer)):
            v = float(value)
            if v != 0.0:
                out.append((name, v))
        elif isinstance(value, (list, tuple, np.ndarray)):
            for i, v in enumerate(value):
                v = float(v)
                if v != 0.0:
                    out.append((f"{name}:{i}", v))
        else:
            out.append((f"{name}={value}", 1.0))
    return out


def _logsumexp(a: np.ndarray, axis: int = -1) -> np.ndarray:
    m = np.max(a, axis=axis, keepdims=True)
    return (m + np.log(np.sum(np.exp(a - m), axis=axis, keepdims=True))).squeeze(axis)


class EncodedSentence:
    """Sparse per-token features: ids[t] / wts[t] arrays, plus gold label ids."""

    __slots__ = ("ids", "wts", "labels")

    def __init__(self, ids: List[np.ndarray], wts: List[np.ndarray],
                 labels: Optional[np.ndarray] = None):
        self.ids = ids
        self.wts = wts
        self.labels = labels


class LinearChainCRF:
    """Linear-chain CRF over dict-features with dense transition matrix
    (equivalent to crfsuite ``all_possible_transitions=True``)."""

    def __init__(self) -> None:
        self.labels: List[str] = []
        self.vocab: Dict[str, int] = {}
        self.W: Optional[np.ndarray] = None  # (n_features, n_labels) state weights
        self.T: Optional[np.ndarray] = None  # (n_labels, n_labels) transition weights

    # ------------------------------------------------------------------ encoding

    def _encode(self, sent_features: Sequence[Dict[str, Any]],
                grow_vocab: bool) -> EncodedSentence:
        ids, wts = [], []
        for fd in sent_features:
            pairs = flatten_features(fd)
            row_ids, row_wts = [], []
            for name, w in pairs:
                idx = self.vocab.get(name)
                if idx is None:
                    if not grow_vocab:
                        continue
                    idx = len(self.vocab)
                    self.vocab[name] = idx
                row_ids.append(idx)
                row_wts.append(w)
            ids.append(np.asarray(row_ids, dtype=np.int64))
            wts.append(np.asarray(row_wts, dtype=np.float64))
        return EncodedSentence(ids, wts)

    def _state_scores(self, enc: EncodedSentence) -> np.ndarray:
        T = len(enc.ids)
        L = len(self.labels)
        S = np.zeros((T, L))
        W = self.W
        for t in range(T):
            if enc.ids[t].size:
                S[t] = enc.wts[t] @ W[enc.ids[t]]
        return S

    # ------------------------------------------------------------------ inference

    def _forward_backward(self, S: np.ndarray):
        """Returns (log_alpha, log_beta, log_Z) for state scores S (T,L)."""
        T, L = S.shape
        log_alpha = np.zeros((T, L))
        log_beta = np.zeros((T, L))
        log_alpha[0] = S[0]
        Tr = self.T
        for t in range(1, T):
            log_alpha[t] = S[t] + _logsumexp(log_alpha[t - 1][:, None] + Tr, axis=0)
        for t in range(T - 2, -1, -1):
            log_beta[t] = _logsumexp(Tr + (S[t + 1] + log_beta[t + 1])[None, :], axis=1)
        log_Z = _logsumexp(log_alpha[-1], axis=0)
        return log_alpha, log_beta, log_Z

    def predict_marginals_single(
        self, sent_features: Sequence[Dict[str, Any]]
    ) -> List[Dict[str, float]]:
        """Per-token marginal distribution over labels (crfsuite
        ``predict_marginals_single`` equivalent; feeds the reference's
        marginal-argmax decode, crf_extractor.py:164)."""
        if not sent_features:
            return []
        enc = self._encode(sent_features, grow_vocab=False)
        S = self._state_scores(enc)
        log_alpha, log_beta, log_Z = self._forward_backward(S)
        marg = np.exp(log_alpha + log_beta - log_Z)
        return [
            {lab: float(marg[t, j]) for j, lab in enumerate(self.labels)}
            for t in range(S.shape[0])
        ]

    def predict_single(self, sent_features: Sequence[Dict[str, Any]]) -> List[str]:
        """Viterbi decode (crfsuite ``predict_single`` equivalent)."""
        if not sent_features:
            return []
        enc = self._encode(sent_features, grow_vocab=False)
        S = self._state_scores(enc)
        T_len, L = S.shape
        delta = S[0].copy()
        back = np.zeros((T_len, L), dtype=np.int64)
        for t in range(1, T_len):
            cand = delta[:, None] + self.T
            back[t] = np.argmax(cand, axis=0)
            delta = S[t] + np.max(cand, axis=0)
        path = [int(np.argmax(delta))]
        for t in range(T_len - 1, 0, -1):
            path.append(int(back[t, path[-1]]))
        path.reverse()
        return [self.labels[j] for j in path]

    def predict(self, X: Sequence[Sequence[Dict[str, Any]]]) -> List[List[str]]:
        return [self.predict_single(sent) for sent in X]

    @property
    def classes_(self) -> List[str]:
        return list(self.labels)

    # ------------------------------------------------------------------ training

    def _nll_grad(self, encs: List[EncodedSentence], W: np.ndarray, T: np.ndarray):
        """Negative log-likelihood and gradients over encoded sentences."""
        gW = np.zeros_like(W)
        gT = np.zeros_like(T)
        nll = 0.0
        self.W, self.T = W, T  # used by _state_scores/_forward_backward
        for enc in encs:
            S = self._state_scores(enc)
            log_alpha, log_beta, log_Z = self._forward_backward(S)
            y = enc.labels
            Tn = S.shape[0]
            # empirical score
            score = S[np.arange(Tn), y].sum() + (T[y[:-1], y[1:]].sum() if Tn > 1 else 0.0)
            nll += log_Z - score
            # unary marginals
            marg = np.exp(log_alpha + log_beta - log_Z)
            for t in range(Tn):
                if enc.ids[t].size:
                    diff = marg[t].copy()
                    diff[y[t]] -= 1.0
                    np.add.at(gW, enc.ids[t], enc.wts[t][:, None] * diff[None, :])
            # pairwise marginals
            for t in range(1, Tn):
                pair = (log_alpha[t - 1][:, None] + T + (S[t] + log_beta[t])[None, :]) - log_Z
                gT += np.exp(pair)
                gT[y[t - 1], y[t]] -= 1.0
        return nll, gW, gT

    def fit(
        self,
        X: Sequence[Sequence[Dict[str, Any]]],
        y: Sequence[Sequence[str]],
        c1: float = 0.1,
        c2: float = 0.1,
        max_iterations: int = 100,
        tol: float = 1e-5,
        X_dev=None,
        y_dev=None,
    ) -> "LinearChainCRF":
        # label & feature vocab build (deterministic: first-seen order)
        self.labels = []
        seen = set()
        for tags in y:
            for tag in tags:
                if tag not in seen:
                    seen.add(tag)
                    self.labels.append(tag)
        lab_idx = {lab: i for i, lab in enumerate(self.labels)}
        self.vocab = {}
        encs: List[EncodedSentence] = []
        for sent, tags in zip(X, y):
            if not sent:
                continue
            enc = self._encode(sent, grow_vocab=True)
            enc.labels = np.asarray([lab_idx[t] for t in tags], dtype=np.int64)
            encs.append(enc)
        F, L = len(self.vocab), len(self.labels)
        n_state = F * L

        def unpack(theta):
            return theta[:n_state].reshape(F, L), theta[n_state:].reshape(L, L)

        def objective(theta):
            W, T = unpack(theta)
            nll, gW, gT = self._nll_grad(encs, W, T)
            # L2 (crfsuite: c2 * ||w||^2) + L1 pseudo-gradient for c1
            loss = nll + c2 * float(theta @ theta) + c1 * float(np.abs(theta).sum())
            grad = np.concatenate([gW.ravel(), gT.ravel()])
            grad += 2.0 * c2 * theta + c1 * np.sign(theta)
            return loss, grad

        # optional dev set: track held-out NLL each iteration and keep the
        # best-dev weights at the end (crfsuite-style holdout monitoring
        # plus selection)
        dev_encs: List[EncodedSentence] = []
        if X_dev and y_dev:
            for sent, tags in zip(X_dev, y_dev):
                if not sent or any(t not in lab_idx for t in tags):
                    continue  # unseen label → sentence can't be scored
                enc = self._encode(sent, grow_vocab=False)
                enc.labels = np.asarray([lab_idx[t] for t in tags],
                                        dtype=np.int64)
                dev_encs.append(enc)

        def dev_nll(theta):
            W, T = unpack(theta)
            nll, _gW, _gT = self._nll_grad(dev_encs, W, T)
            return nll

        theta = np.zeros(n_state + L * L)
        loss, grad = objective(theta)
        best_dev = (dev_nll(theta), theta.copy()) if dev_encs else None
        s_hist: List[np.ndarray] = []
        y_hist: List[np.ndarray] = []
        m = 10
        for _ in range(max_iterations):
            # L-BFGS two-loop recursion
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
            # backtracking Armijo line search
            step = 1.0
            d_dot_g = direction @ grad
            if d_dot_g >= 0:  # safeguard: fall back to steepest descent
                direction = -grad
                d_dot_g = -(grad @ grad)
            new_loss, new_grad, new_theta = None, None, None
            for _ls in range(30):
                cand = theta + step * direction
                l2, g2 = objective(cand)
                if l2 <= loss + 1e-4 * step * d_dot_g:
                    new_loss, new_grad, new_theta = l2, g2, cand
                    break
                step *= 0.5
            if new_theta is None:
                break
            s_vec = new_theta - theta
            y_vec = new_grad - grad
            if (y_vec @ s_vec) > 1e-10:
                s_hist.append(s_vec)
                y_hist.append(y_vec)
                if len(s_hist) > m:
                    s_hist.pop(0)
                    y_hist.pop(0)
            rel_improve = abs(loss - new_loss) / max(1.0, abs(loss))
            theta, loss, grad = new_theta, new_loss, new_grad
            if best_dev is not None:
                d = dev_nll(theta)
                if d < best_dev[0]:
                    best_dev = (d, theta.copy())
            if rel_improve < tol:
                break
        if best_dev is not None:
            theta = best_dev[1]
        self.W, self.T = unpack(theta)
        return self

    # ------------------------------------------------------------------ artifacts

    def state_dict(self) -> Dict[str, Any]:
        return {
            "labels": self.labels,
            "vocab": self.vocab,
            "W": self.W,
            "T": self.T,
        }

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            W=self.W,
            T=self.T,
            labels=json.dumps(self.labels),
            vocab=json.dumps(self.vocab),
        )

    @classmethod
    def load(cls, path: str) -> "LinearChainCRF":
        data = np.load(path, allow_pickle=False)
        model = cls()
        model.W = data["W"]
        model.T = data["T"]
        model.labels = json.loads(str(data["labels"]))
        model.vocab = json.loads(str(data["vocab"]))
        return model
