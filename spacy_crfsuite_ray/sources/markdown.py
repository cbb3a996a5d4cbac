"""Rasa-style markdown gold-annotation reader.

Semantics match /root/reference/spacy_crfsuite/markdown.py:5-78: strip HTML
comments, track ``##`` section headers, parse ``- item`` lines, extract
``[text](entity)`` / ``[text](entity:value)`` annotations, and compute char
offsets with a cumulative markup-length correction so offsets index the PLAIN
text. This substitution (annotated markup in → plain text + offset-correct
entities out) is the anchor for the byte-identical-extraction invariant.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

ITEM_RE = re.compile(r"\s*[-*+]\s*(.+)")
ENT_RE = re.compile(
    r"\[(?P<entity_text>[^\]]+)"
    r"\]\((?P<entity>[^:)]*?)"
    r"(?:\:(?P<value>[^)]+))?\)"
)
COMMENT_RE = re.compile(r"<!--[\s\S]*?--!*>", re.MULTILINE)
HEADER_RE = re.compile(r"##\s*(.+)?")


def strip_comments(text: str) -> str:
    return COMMENT_RE.sub("", text)


def find_entities(example: str) -> List[Dict]:
    entities = []
    offset = 0  # cumulative markup chars removed so far
    for m in ENT_RE.finditer(example):
        entity_text = m.group("entity_text")
        value = m.group("value") or entity_text
        start = m.start() - offset
        end = start + len(entity_text)
        offset += len(m.group(0)) - len(entity_text)
        entities.append(
            {"start": start, "end": end, "value": value, "entity": m.group("entity")}
        )
    return entities


def parse_item(line: str) -> Optional[Dict]:
    m = ITEM_RE.match(line)
    if not m:
        return None
    example = m.group(1)
    entities = find_entities(example)
    plain = ENT_RE.sub(lambda mm: mm.group("entity_text"), example)
    return {"text": plain, "entities": entities}


def read_markdown(text: str, headers: Optional[List[str]] = None) -> List[Dict]:
    examples = []
    current_section = None
    for line in strip_comments(text).splitlines():
        line = line.strip()
        hm = HEADER_RE.search(line)
        if hm:
            current_section = hm.group(1)
        elif headers is None or current_section in headers:
            msg = parse_item(line)
            if msg:
                examples.append(msg)
    return examples


def read_markdown_file(path: str, headers: Optional[List[str]] = None) -> List[Dict]:
    with open(path, "r", encoding="utf-8") as f:
        return read_markdown(f.read(), headers)
