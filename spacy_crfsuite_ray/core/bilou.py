"""BILOU tagging scheme helpers.

Semantics match the reference (/root/reference/spacy_crfsuite/bilou.py:1-99):
offsets→tags only fire when entity start/end align exactly with token
boundaries; single-token entities get ``U-``, multi-token get ``B- I-… L-``;
everything else is ``O``.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

BILOU_PREFIXES = {"B-", "I-", "U-", "L-"}
NO_ENTITY_TAG = "O"


def get_entity_offsets(message: Dict) -> List[Tuple[int, int, str]]:
    return [(e["start"], e["end"], e["entity"]) for e in message.get("entities", [])]


def bilou_prefix_from_tag(tag: str) -> Optional[str]:
    if tag[:2] in BILOU_PREFIXES:
        return tag[0]
    return None


def entity_name_from_tag(tag: str) -> str:
    if tag[:2] in BILOU_PREFIXES:
        return tag[2:]
    return tag


def bilou_tags_from_offsets(
    tokens: List, entities: List[Tuple[int, int, str]]
) -> List[str]:
    start_to_idx = {t.start: i for i, t in enumerate(tokens)}
    end_to_idx = {t.end: i for i, t in enumerate(tokens)}
    tags = [NO_ENTITY_TAG] * len(tokens)
    for start, end, label in entities:
        si = start_to_idx.get(start)
        ei = end_to_idx.get(end)
        if si is None or ei is None:
            continue  # misaligned annotation: leave O (reference bilou.py:85)
        if si == ei:
            tags[si] = f"U-{label}"
        else:
            tags[si] = f"B-{label}"
            for i in range(si + 1, ei):
                tags[i] = f"I-{label}"
            tags[ei] = f"L-{label}"
    return tags


def remove_bilou_prefixes(tags: List[str]) -> None:
    """In-place strip of BILOU prefixes → IO scheme (reference bilou.py:96-99)."""
    for i, tag in enumerate(tags):
        if bilou_prefix_from_tag(tag):
            tags[i] = entity_name_from_tag(tag)
