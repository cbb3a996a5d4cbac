"""Featurization: message → CRF tokens → per-token feature dicts.

Key-format semantics mirror the reference exactly:
- CRFToken fields (/root/reference/spacy_crfsuite/features.py:15-21),
- gold tag default "N/A" at predict time (features.py:55),
- dense-feature pooling + alignment guard (features.py:65-94, 138-156),
- misaligned-annotation warning path (features.py:96-125),
- sliding window with "{offset}:{feature}" keys, BOS/EOS flags, pattern
  expansion (/root/reference/spacy_crfsuite/crf_extractor.py:513-549),
- feature function vocabulary (crf_extractor.py:67-84).
"""

from __future__ import annotations

import warnings
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Union

import numpy as np

from .bilou import bilou_tags_from_offsets, get_entity_offsets
from .tokens import tokens_without_cls


class Pooling:
    MEAN = "mean"
    MAX = "max"


class CRFToken(NamedTuple):
    text: str
    tag: str
    entity: str
    shape: Union[str, int]
    pattern: Dict[str, Any]
    dense_features: Any


# per-token feature functions (reference crf_extractor.py:67-84)
FUNCTION_DICT: Dict[str, Callable[[CRFToken], Any]] = {
    "low": lambda t: t.text.lower(),
    "title": lambda t: t.text.istitle(),
    "prefix5": lambda t: t.text[:5],
    "prefix2": lambda t: t.text[:2],
    "suffix5": lambda t: t.text[-5:],
    "suffix3": lambda t: t.text[-3:],
    "suffix2": lambda t: t.text[-2:],
    "suffix1": lambda t: t.text[-1:],
    "bias": lambda t: "bias",
    "pos": lambda t: t.tag,
    "pos2": lambda t: t.tag[:2] if t.tag is not None else None,
    "upper": lambda t: t.text.isupper(),
    "digit": lambda t: t.text.isdigit(),
    "shape": lambda t: t.shape,
    "pattern": lambda t: t.pattern,
    "dense_features": lambda t: t.dense_features,
}

DEFAULT_FEATURES = [
    ["low", "title", "upper"],
    [
        "low", "bias", "prefix5", "prefix2", "suffix5", "suffix3", "suffix2",
        "upper", "title", "digit", "pattern", "shape",
    ],
    ["low", "title", "upper"],
]


class Featurizer:
    """message dict → List[CRFToken] (reference features.py:24-94)."""

    def __init__(self, use_dense_features: bool = False,
                 dense_features_cls_pooling: str = Pooling.MEAN):
        self.use_dense_features = use_dense_features
        self.cls_pooling = dense_features_cls_pooling

    def __call__(self, message: Dict,
                 entities: Optional[List[str]] = None) -> List[CRFToken]:
        crf_tokens = []
        tokens = tokens_without_cls(message)
        dense = self.get_dense_features(message)
        for i, token in enumerate(tokens):
            pattern = token.get("pattern", {}) or {}
            entity = entities[i] if entities else "N/A"
            crf_tokens.append(
                CRFToken(
                    token.text,
                    token.get("pos"),
                    entity,
                    token.get("shape"),
                    pattern,
                    dense[i] if dense is not None else [],
                )
            )
        return crf_tokens

    def get_dense_features(self, message: Dict) -> Optional[List[Any]]:
        if not self.use_dense_features:
            return None
        tokens = tokens_without_cls(message)
        features = [t.get("vector") for t in tokens if t.get("vector") is not None]
        if len(features) > 0:
            features = np.vstack(features)
            cls_vec = self._calculate_cls_vector(features, self.cls_pooling)
            features = np.concatenate([features, cls_vec])
        if len(features) != len(tokens) + 1:
            return None  # alignment guard (reference features.py:84-85)
        out = []
        for row in features:
            out.append({"text_dense_features": {str(i): v for i, v in enumerate(row)}})
        return out

    def apply_bilou_schema(self, message: Dict) -> List[str]:
        """Offsets → BILOU tags. Misaligned annotations (start/end not on a
        token boundary) are dropped by bilou_tags_from_offsets; surface a
        warning for each so training data never loses gold silently (the
        diagnostic the reference intended at features.py:110-124)."""
        tokens = tokens_without_cls(message)
        offsets = get_entity_offsets(message)
        tags = bilou_tags_from_offsets(tokens, offsets)
        starts = {t.start for t in tokens}
        ends = {t.end for t in tokens}
        for start, end, label in offsets:
            if start not in starts or end not in ends:
                warnings.warn(
                    f"Misaligned entity annotation ({start}, {end}, {label!r}) "
                    f"in sentence \"{message.get('text', '')}\" was dropped; "
                    "annotations must start/end at token boundaries."
                )
        return tags

    @staticmethod
    def _calculate_cls_vector(features: np.ndarray,
                              pooling: str = Pooling.MEAN) -> np.ndarray:
        non_zero = np.array([f for f in features if f.any()])
        if non_zero.size == 0:
            return np.zeros([1, features.shape[-1]])
        if pooling == Pooling.MEAN:
            return np.mean(non_zero, axis=0, keepdims=True)
        if pooling == Pooling.MAX:
            return np.max(non_zero, axis=0, keepdims=True)
        raise ValueError(f"Invalid pooling operation: {pooling!r}")


def features_for_token(crf_tokens: List[CRFToken], token_idx: int,
                       configured_features: List[List[str]]) -> Dict[str, Any]:
    """Window featurization for one token (reference crf_extractor.py:513-549).

    window_size = len(configured_features); range [-w//2, +w//2]; out-of-range
    positions set a boolean BOS/EOS flag; keys are "{offset}:{feature}";
    "pattern" expands to one key per pattern name.
    """
    token_features: Dict[str, Any] = {}
    window_size = len(configured_features)
    half = window_size // 2
    window_range = range(-half, half + 1)
    prefixes = [str(i) for i in window_range]

    for feature_idx in window_range:
        if token_idx + feature_idx >= len(crf_tokens):
            token_features["EOS"] = True
        elif token_idx + feature_idx < 0:
            token_features["BOS"] = True
        else:
            token = crf_tokens[token_idx + feature_idx]
            pos_in_window = feature_idx + half
            prefix = prefixes[pos_in_window]
            for feature in configured_features[pos_in_window]:
                if feature == "pattern":
                    for p_name, matched in FUNCTION_DICT[feature](token).items():
                        token_features[f"{prefix}:{feature}:{p_name}"] = matched
                else:
                    token_features[f"{prefix}:{feature}"] = FUNCTION_DICT[feature](token)
    return token_features


def sentence_to_features(crf_tokens: List[CRFToken],
                         configured_features: List[List[str]]) -> List[Dict[str, Any]]:
    return [
        features_for_token(crf_tokens, i, configured_features)
        for i in range(len(crf_tokens))
    ]


def sentence_to_tags(crf_tokens: List[CRFToken]) -> List[str]:
    return [t.entity for t in crf_tokens]
