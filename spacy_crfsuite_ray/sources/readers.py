"""`read_file` dispatcher — routes gold-annotation files by extension.

Semantics of /root/reference/spacy_crfsuite/utils.py:26-90:
.json → list of example dicts; .jsonl → one dict per line; .md/.markdown →
MarkdownReader; .yml/.yaml → each string under the ``nlu`` sections' examples
parsed through the markdown reader; .txt/.conll → CoNLL blocks; anything
else raises ValueError.
"""

from __future__ import annotations

import json
from typing import Dict, List

from .conll import read_conll
from .markdown import read_markdown, read_markdown_file


def read_file(path: str, **kwargs) -> List[Dict]:
    low = path.lower()
    if low.endswith(".json"):
        with open(path, "r", encoding="utf-8") as f:
            return json.load(f)
    if low.endswith(".jsonl"):
        with open(path, "r", encoding="utf-8") as f:
            return [json.loads(line) for line in f if line.strip()]
    if low.endswith((".md", ".markdown")):
        return read_markdown_file(path, **kwargs)
    if low.endswith((".yml", ".yaml")):
        import yaml

        with open(path, "r", encoding="utf-8") as f:
            doc = yaml.safe_load(f)
        examples: List[Dict] = []
        for section in doc.get("nlu", []) if isinstance(doc, dict) else []:
            raw = section.get("examples", "")
            if isinstance(raw, str):
                examples.extend(read_markdown(raw, **kwargs))
        return examples
    if low.endswith((".txt", ".conll")):
        return list(read_conll(path))
    raise ValueError(
        f"Unsupported file extension: {path!r} "
        "(expected .json/.jsonl/.md/.markdown/.yml/.yaml/.txt/.conll)"
    )
