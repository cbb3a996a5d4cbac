"""Dependency-pattern relation extraction: tagged sentence → (subj, pred, obj).

The reference has no relation stage; the north_star adds "dependency-pattern
relation extraction to emit (subj, pred, obj) triples" around the CRF mention
detector. Patterns are deterministic regexes over the text BETWEEN two entity
mentions in the same sentence (no parser is available in this environment), a
published-in-the-open-IE-literature surface-pattern approach (ReVerb-style).

A triple fires only for ADJACENT entity pairs (no third entity in between) and
an inter-text under 60 chars — keeps precision high and work bounded per row.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

# (compiled_pattern, predicate, reversed) — reversed=True means the relation
# reads obj←subj, e.g. "Y was founded by X".
_PATTERNS = [
    (re.compile(r",?\s*(?:the\s+)?president of\b", re.I), "president_of", False),
    (re.compile(r",?\s*(?:the\s+)?ceo of\b", re.I), "ceo_of", False),
    (re.compile(r",?\s*(?:the\s+)?founder of\b", re.I), "founder_of", False),
    (re.compile(r",?\s*(?:the\s+)?director of\b", re.I), "director_of", False),
    (re.compile(r"\bwas born in\b", re.I), "born_in", False),
    (re.compile(r"\bwas founded by\b", re.I), "founded_by", False),
    (re.compile(r"\bfounded\b", re.I), "founded", False),
    (re.compile(r"\bacquired\b", re.I), "acquired", False),
    (re.compile(r"\bworks? (?:at|for)\b", re.I), "works_at", False),
    (re.compile(r"\b(?:is )?(?:located|headquartered|based) in\b", re.I),
     "located_in", False),
    (re.compile(r"\bis the capital of\b", re.I), "capital_of", False),
    (re.compile(r"\bmarried\b", re.I), "married", False),
    (re.compile(r"\bvisited\b", re.I), "visited", False),
    (re.compile(r"\bmoved to\b", re.I), "moved_to", False),
    (re.compile(r"\bpartnered with\b", re.I), "partnered_with", False),
]

MAX_GAP_CHARS = 60


def extract_relations(
    text: str, entities: List[Dict[str, Any]], url: str = ""
) -> List[Dict[str, Any]]:
    """entities: decoded entity dicts {start,end,value,entity,confidence},
    char offsets into ``text``. Returns triple dicts."""
    ents = sorted(entities, key=lambda e: (e["start"], e["end"]))
    triples = []
    for a, b in zip(ents, ents[1:]):
        gap = text[a["end"]: b["start"]]
        if len(gap) > MAX_GAP_CHARS:
            continue
        for pattern, pred, rev in _PATTERNS:
            if pattern.search(gap):
                subj, obj = (b, a) if rev else (a, b)
                conf = min(
                    float(a.get("confidence", 1.0)), float(b.get("confidence", 1.0))
                )
                triples.append(
                    {
                        "subj": subj["value"],
                        "pred": pred,
                        "obj": obj["value"],
                        "subj_type": subj["entity"],
                        "obj_type": obj["entity"],
                        "url": url,
                        "confidence": conf,
                    }
                )
                break  # first matching pattern wins, one triple per pair
    return triples
