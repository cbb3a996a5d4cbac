"""CRF entity extractor: config, process (marginal decode), train, eval.

Re-implements the reference CRFExtractor semantics
(/root/reference/spacy_crfsuite/crf_extractor.py) on top of the numpy CRF:

- defaults incl. the 3-window feature config (crf_extractor.py:28-65),
- ``process`` = featurize → per-token marginals → BILOU span decode
  (crf_extractor.py:148-165),
- confidence semantics: argmax label per token, confidence = sum of marginals
  of all tags sharing the entity name under BILOU (crf_extractor.py:343-362),
  min-over-span for multi-token entities (crf_extractor.py:407),
- both BILOU repair behaviors: mixed-class span keeps the B- class
  (crf_extractor.py:409-416); unclosed B- backs up one token
  (crf_extractor.py:425-432),
- span value preserves the original inter-token text (crf_extractor.py:377-382),
- eval report label ordering: classes minus O, sorted by (name[1:], name[0])
  (crf_extractor.py:218-220).
"""

from __future__ import annotations

import copy
import warnings
from typing import Any, Dict, List, Optional, Sequence, Tuple

from .bilou import NO_ENTITY_TAG, bilou_prefix_from_tag, entity_name_from_tag
from .crf import LinearChainCRF
from .features import (
    CRFToken,
    DEFAULT_FEATURES,
    Featurizer,
    sentence_to_features,
    sentence_to_tags,
)
from .tokens import tokens_without_cls

DEFAULTS: Dict[str, Any] = {
    "BILOU_flag": True,
    "features": DEFAULT_FEATURES,
    "algorithm": "lbfgs",
    "max_iter": 1000,
    "c1": 0.1,
    "c2": 0.1,
    "all_possible_transitions": True,
}


def override_defaults(defaults: Dict[str, Any],
                      custom: Optional[Dict[str, Any]]) -> Dict[str, Any]:
    """Deep-copy defaults with one-level-nested merge (reference utils.py:8-23)."""
    cfg = copy.deepcopy(defaults)
    if custom:
        for key, value in custom.items():
            if isinstance(cfg.get(key), dict) and isinstance(value, dict):
                cfg[key].update(value)
            else:
                cfg[key] = value
    return cfg


class CRFExtractor:
    def __init__(
        self,
        component_config: Optional[Dict[str, Any]] = None,
        ent_tagger: Optional[LinearChainCRF] = None,
    ) -> None:
        self.component_config = override_defaults(DEFAULTS, component_config)
        self.ent_tagger = ent_tagger
        self.featurizer = Featurizer(use_dense_features=self.use_dense_features())

    def use_dense_features(self) -> bool:
        return any(
            "dense_features" in fl for fl in self.component_config["features"]
        )

    def _check_runtime(self) -> None:
        if self.ent_tagger is None:
            raise RuntimeError(
                "CRF tagger was not fitted; call .train() or load a model first."
            )

    # ---------------------------------------------------------------- features

    def example_to_features(self, crf_tokens: List[CRFToken]) -> List[Dict[str, Any]]:
        return sentence_to_features(crf_tokens, self.component_config["features"])

    # ---------------------------------------------------------------- inference

    def process(self, example: Dict) -> List[Dict[str, Any]]:
        self._check_runtime()
        crf_tokens = self.featurizer(example)
        features = self.example_to_features(crf_tokens)
        marginals = self.ent_tagger.predict_marginals_single(features)
        return self.marginals_to_entities(example, marginals)

    def marginals_to_entities(
        self, message: Dict, marginals: List[Dict[str, float]]
    ) -> List[Dict[str, Any]]:
        tokens = tokens_without_cls(message)
        if len(tokens) != len(marginals):
            raise Exception(
                "Inconsistency in amount of tokens between tagger and message"
            )
        if self.component_config["BILOU_flag"]:
            return self._decode_bilou(message, tokens, marginals)
        return self._decode_simple(tokens, marginals)

    def most_likely_entity(
        self, idx: int, marginals: List[Dict[str, float]]
    ) -> Tuple[str, float]:
        probs = marginals[idx] if len(marginals) > idx else None
        if not probs:
            return "", 0.0
        label = max(probs, key=probs.get)
        if self.component_config["BILOU_flag"]:
            # combine probability mass of B/I/L/U tags naming the same entity
            return label, sum(v for k, v in probs.items() if k[2:] == label[2:])
        return label, probs[label]

    def _find_bilou_end(self, word_idx: int, marginals) -> Tuple[int, float]:
        ent_word_idx = word_idx + 1
        label, confidence = self.most_likely_entity(word_idx, marginals)
        entity_label = entity_name_from_tag(label)
        while True:
            label, label_conf = self.most_likely_entity(ent_word_idx, marginals)
            confidence = min(confidence, label_conf)
            if label[2:] != entity_label:
                warnings.warn(
                    "Inconsistent BILOU tagging found: B-/L- pair encloses "
                    "multiple entity classes (e.g. [B-a, I-b, L-a]); "
                    "assuming the B- class is correct."
                )
            if label.startswith("L-"):
                return ent_word_idx, confidence
            if label.startswith("I-"):
                ent_word_idx += 1
                continue
            # entity not closed by an L- tag: back up one token
            warnings.warn(
                "Inconsistent BILOU tagging found: B- tag not closed by L- tag "
                "(e.g. [B-a, I-a, O]); assuming the last tag is L-."
            )
            return ent_word_idx - 1, confidence

    def _handle_bilou_label(self, word_idx: int, marginals):
        label, confidence = self.most_likely_entity(word_idx, marginals)
        entity_label = entity_name_from_tag(label)
        prefix = bilou_prefix_from_tag(label)
        if prefix == "U":
            return word_idx, confidence, entity_label
        if prefix == "B":
            end_idx, confidence = self._find_bilou_end(word_idx, marginals)
            return end_idx, confidence, entity_label
        return None, None, None

    @staticmethod
    def _create_entity_dict(message, tokens, start, end, entity, confidence):
        value = tokens[start].text
        value += "".join(
            message["text"][tokens[i - 1].end: tokens[i].start] + tokens[i].text
            for i in range(start + 1, end + 1)
        )
        return {
            "start": tokens[start].start,
            "end": tokens[end].end,
            "value": value,
            "entity": entity,
            "confidence": confidence,
        }

    def _decode_bilou(self, message, tokens, marginals):
        ents = []
        word_idx = 0
        while word_idx < len(tokens):
            end_idx, confidence, entity_label = self._handle_bilou_label(
                word_idx, marginals
            )
            if end_idx is not None:
                ents.append(
                    self._create_entity_dict(
                        message, tokens, word_idx, end_idx, entity_label, confidence
                    )
                )
                word_idx = end_idx + 1
            else:
                word_idx += 1
        return ents

    def _decode_simple(self, tokens, marginals):
        ents = []
        for word_idx in range(len(tokens)):
            label, confidence = self.most_likely_entity(word_idx, marginals)
            if label != NO_ENTITY_TAG:
                tok = tokens[word_idx]
                ents.append(
                    {
                        "start": tok.start,
                        "end": tok.end,
                        "value": tok.text,
                        "entity": label,
                        "confidence": confidence,
                    }
                )
        return ents

    # ---------------------------------------------------------------- training

    def train(
        self,
        training_samples: Sequence[List[CRFToken]],
        dev_samples: Optional[Sequence[List[CRFToken]]] = None,
    ) -> "CRFExtractor":
        if self.ent_tagger is None:
            self.ent_tagger = LinearChainCRF()
        X = [self.example_to_features(sent) for sent in training_samples]
        y = [sentence_to_tags(sent) for sent in training_samples]
        X_dev = y_dev = None
        if dev_samples:
            X_dev = [self.example_to_features(sent) for sent in dev_samples]
            y_dev = [sentence_to_tags(sent) for sent in dev_samples]
        self.ent_tagger.fit(
            X,
            y,
            c1=self.component_config["c1"],
            c2=self.component_config["c2"],
            max_iterations=self.component_config["max_iter"],
            X_dev=X_dev,
            y_dev=y_dev,
        )
        return self

    def eval(self, eval_samples: Sequence[List[CRFToken]]) -> Tuple[Dict, str]:
        """Per-tag P/R/F1 report (sklearn classification_report equivalent).

        Returns (report_dict, report_text). Label order: classes minus O,
        sorted by (name[1:], name[0]) — reference crf_extractor.py:218-220.
        """
        self._check_runtime()
        X = [self.example_to_features(sent) for sent in eval_samples]
        y_true = [tag for sent in eval_samples for tag in sentence_to_tags(sent)]
        y_pred = [tag for sent in self.ent_tagger.predict(X) for tag in sent]
        labels = [lab for lab in self.ent_tagger.classes_ if lab != NO_ENTITY_TAG]
        labels.sort(key=lambda name: (name[1:], name[0]))
        return classification_report(y_true, y_pred, labels)

    def explain(self, n: int = 10) -> str:
        """Top-n likely/unlikely transitions and state features
        (reference crf_extractor.py:292-341, minus its copy-paste bug)."""
        self._check_runtime()
        tagger = self.ent_tagger
        L = tagger.labels
        trans = [
            ((L[i], L[j]), float(tagger.T[i, j]))
            for i in range(len(L))
            for j in range(len(L))
        ]
        trans.sort(key=lambda kv: -kv[1])
        feats = [
            ((name, L[j]), float(tagger.W[idx, j]))
            for name, idx in tagger.vocab.items()
            for j in range(len(L))
        ]
        feats.sort(key=lambda kv: -kv[1])
        lines = ["Most likely transitions:"]
        lines += [f"{a:10} -> {b:10} {w:+.6f}" for (a, b), w in trans[:n]]
        lines.append("\nMost unlikely transitions:")
        lines += [f"{a:10} -> {b:10} {w:+.6f}" for (a, b), w in trans[-n:]]
        lines.append("\nPositive features:")
        lines += [f"{w:+.6f} {lab:10} {name}" for (name, lab), w in feats[:n]]
        lines.append("\nNegative features:")
        lines += [f"{w:+.6f} {lab:10} {name}" for (name, lab), w in feats[-n:]]
        return "\n".join(lines)


def classification_report(
    y_true: List[str], y_pred: List[str], labels: List[str]
) -> Tuple[Dict, str]:
    """Minimal sklearn.metrics.classification_report equivalent (digits=3)."""
    stats = {}
    for lab in labels:
        tp = sum(1 for t, p in zip(y_true, y_pred) if t == lab and p == lab)
        fp = sum(1 for t, p in zip(y_true, y_pred) if t != lab and p == lab)
        fn = sum(1 for t, p in zip(y_true, y_pred) if t == lab and p != lab)
        support = tp + fn
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / support if support else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        stats[lab] = {"precision": prec, "recall": rec, "f1-score": f1,
                      "support": support}
    total_support = sum(s["support"] for s in stats.values()) or 1
    micro_tp = sum(1 for t, p in zip(y_true, y_pred) if t == p and t in stats)
    micro_pred = sum(1 for p in y_pred if p in stats)
    micro_true = sum(1 for t in y_true if t in stats)
    mp = micro_tp / micro_pred if micro_pred else 0.0
    mr = micro_tp / micro_true if micro_true else 0.0
    stats["micro avg"] = {
        "precision": mp,
        "recall": mr,
        "f1-score": 2 * mp * mr / (mp + mr) if mp + mr else 0.0,
        "support": micro_true,
    }
    stats["macro avg"] = {
        k: sum(stats[lab][k] for lab in labels) / (len(labels) or 1)
        for k in ("precision", "recall", "f1-score")
    }
    stats["macro avg"]["support"] = micro_true
    stats["weighted avg"] = {
        k: sum(stats[lab][k] * stats[lab]["support"] for lab in labels) / total_support
        for k in ("precision", "recall", "f1-score")
    }
    stats["weighted avg"]["support"] = micro_true
    width = max((len(lab) for lab in stats), default=10)
    lines = [f"{'':>{width}}  precision  recall  f1-score  support"]
    for lab in labels + ["micro avg", "macro avg", "weighted avg"]:
        s = stats[lab]
        lines.append(
            f"{lab:>{width}}  {s['precision']:9.3f}  {s['recall']:6.3f}  "
            f"{s['f1-score']:8.3f}  {s['support']:7d}"
        )
    return stats, "\n".join(lines)


def gold_example_to_crf_tokens(
    example: Dict,
    tokenizer=None,
    featurizer: Optional[Featurizer] = None,
    bilou: bool = True,
) -> List[CRFToken]:
    """Prepare one gold example for train/eval (reference train.py:17-60):
    tokenize raw text (or accept pre-tokenized input), apply BILOU schema,
    optionally strip prefixes to IO tags, then featurize."""
    from .tokenizer import RegexTokenizer
    from .bilou import remove_bilou_prefixes

    if not example:
        return []
    featurizer = featurizer or Featurizer()
    if "tokens" not in example:
        if "text" not in example:
            raise ValueError("example must have either 'text' or 'tokens'")
        (tokenizer or RegexTokenizer()).tokenize(example, attribute="text")
    entities = featurizer.apply_bilou_schema(example)
    if not bilou:
        remove_bilou_prefixes(entities)
    return featurizer(example, entities)
