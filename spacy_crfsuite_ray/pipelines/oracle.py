"""Sequential oracle: the exact pipeline semantics, single process, no Ray.

Shares every per-row function with the Ray stages (extract_text,
split_sentences, tag_sentences, extract_relations, link_mentions), so a
Ray-vs-oracle mismatch isolates distribution bugs, not semantic drift.
Used by tests (triple P/R ≥ 0.95 gate is exact-match here) and by the
correctness driver.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional, Tuple

import pyarrow.parquet as pq

from ..core.html import extract_text
from ..core.linking import link_mentions, normalize_surface
from ..core.relations import extract_relations
from ..core.sentences import split_sentences
from ..core.tokenizer import RegexTokenizer
from ..functions.hashing import edge_id, node_id
from ..stages.tag import tag_sentences
from ..state.model import ensure_default_model, load_extractor


def run_oracle(page_files: List[str], model_path: Optional[str] = None,
               lang: str = "en") -> Dict:
    """Returns dict with 'triples', 'mentions', 'nodes', 'edges' lists."""
    extractor = load_extractor(model_path or ensure_default_model())
    tokenizer = RegexTokenizer()

    triples: List[Dict] = []
    mentions: List[Tuple[str, str]] = []
    mention_rows: List[Dict] = []
    for path in page_files:
        table = pq.read_table(path, columns=["url", "html", "lang"])
        for url, html, page_lang in zip(
            table.column("url").to_pylist(),
            table.column("html").to_pylist(),
            table.column("lang").to_pylist(),
        ):
            if page_lang != lang:
                continue
            text = extract_text(html)
            sents = split_sentences(text)
            ents_per_sent = tag_sentences(
                extractor, tokenizer, [s for _, s in sents]
            )
            for (_, sent), ents in zip(sents, ents_per_sent):
                if not ents:
                    continue
                triples.extend(extract_relations(sent, ents, url=url))
                for e in ents:
                    mentions.append((e["value"], e["entity"]))
                    mention_rows.append(
                        {"url": url, "value": e["value"], "type": e["entity"]}
                    )

    mapping = link_mentions(mentions)

    canonical_triples = []
    for t in triples:
        sc = mapping.get((t["subj"], t["subj_type"]),
                         normalize_surface(t["subj"]))
        oc = mapping.get((t["obj"], t["obj_type"]),
                         normalize_surface(t["obj"]))
        canonical_triples.append(
            {**t, "subj_canonical": sc, "obj_canonical": oc,
             "subj_id": node_id(sc, t["subj_type"]),
             "obj_id": node_id(oc, t["obj_type"])}
        )

    node_counter: Counter = Counter()
    node_meta: Dict[str, Tuple[str, str]] = {}
    for value, type_ in mentions:
        canon = mapping.get((value, type_), normalize_surface(value))
        nid = node_id(canon, type_)
        node_counter[nid] += 1
        node_meta.setdefault(nid, (canon, type_))
    nodes = [
        {"node_id": nid, "canonical": node_meta[nid][0],
         "type": node_meta[nid][1], "n_mentions": cnt}
        for nid, cnt in sorted(node_counter.items())
    ]

    edge_map: Dict[str, Dict] = {}
    for t in canonical_triples:
        eid = edge_id(t["subj_id"], t["pred"], t["obj_id"])
        rec = edge_map.setdefault(
            eid,
            {"edge_id": eid, "subj_id": t["subj_id"], "pred": t["pred"],
             "obj_id": t["obj_id"], "urls": set(), "confidence": 0.0},
        )
        rec["urls"].add(t["url"])
        rec["confidence"] = max(rec["confidence"], t["confidence"])
    edges = [
        {"edge_id": e["edge_id"], "subj_id": e["subj_id"], "pred": e["pred"],
         "obj_id": e["obj_id"], "n_sources": len(e["urls"]),
         "confidence": e["confidence"]}
        for e in sorted(edge_map.values(), key=lambda r: r["edge_id"])
    ]

    return {
        "triples": canonical_triples,
        "mentions": mention_rows,
        "nodes": nodes,
        "edges": edges,
    }


def triple_prf(
    predicted: List[Dict], gold: List[Dict], keys=("subj", "pred", "obj")
) -> Dict[str, float]:
    """Set-based precision/recall/F1 over triple key tuples."""
    p = {tuple(t[k] for k in keys) for t in predicted}
    g = {tuple(t[k] for k in keys) for t in gold}
    tp = len(p & g)
    prec = tp / len(p) if p else 0.0
    rec = tp / len(g) if g else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"precision": prec, "recall": rec, "f1": f1,
            "n_pred": len(p), "n_gold": len(g)}
