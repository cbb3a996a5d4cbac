"""Deterministic synthetic Common-Crawl-style pages fixture (FIXTURES.md F1).

Schema matches BASELINE.json input_hint exactly:
    (url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)

Sentences are assembled from fixed templates with entities planted from fixed
vocabularies, so gold entities/triples are known at generation time. ``text``
is computed by running the engine's own extractor over the generated ``html``
(ground truth for the byte-identical invariant by construction). Skew knobs:
hot domains (~30% of urls on 3 domains) and giant pages (1/251 pages gets 40×
the sentences). Everything is keyed off ``random.Random(f"page-{i}")`` — no
global RNG, so any row range can be generated independently (a requirement for
generating shards in parallel at scale).
"""

from __future__ import annotations

import datetime as _dt
import os
import random
from typing import Dict, Iterator, List, Optional, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

from ..core.html import extract_text

PERSONS = [
    f"{first} {last}"
    for first in ["Alice", "Bob", "Carol", "David", "Elena", "Frank", "Grace",
                  "Henry", "Irene", "James", "Karen", "Louis", "Maria", "Nolan",
                  "Olga", "Peter", "Quinn", "Rosa", "Simon", "Teresa"]
    for last in ["Martin", "Okafor", "Svensson", "Tanaka", "Ueda"]
]
ORGS = [
    f"{a} {b}"
    for a in ["Acme", "Initech", "Globex", "Umbra", "Vertex", "Zenith", "Nimbus",
              "Quanta", "Helios", "Orchid"]
    for b in ["Corp", "Labs", "Systems", "Holdings", "Industries", "Partners"]
]
LOCS = [
    "Springfield", "Rivertown", "Lakeside", "Hillcrest", "Easton", "Weston",
    "Northfield", "Southgate", "Maplewood", "Cedar Falls", "Pine Ridge",
    "Oak Valley", "Elm Grove", "Birchwood", "Ashford", "Stonebridge",
    "Clearwater", "Fairview", "Granite City", "Harborview", "Ironton",
    "Juniper Hills", "Kingsport", "Larkspur", "Millbrook", "Newhaven",
    "Orchard Park", "Port Averill", "Quarry Bend", "Redwood Flats",
]

# (template, pred, subj_slot, obj_slot); slots name the vocab + index
RELATION_TEMPLATES = [
    ("{PER}, president of {ORG}, announced a new initiative.",
     "president_of", "PER", "ORG"),
    ("{PER}, the CEO of {ORG}, spoke at the summit.", "ceo_of", "PER", "ORG"),
    ("{PER} was born in {LOC}.", "born_in", "PER", "LOC"),
    ("{ORG} acquired {ORG2} last year.", "acquired", "ORG", "ORG2"),
    ("{ORG} is headquartered in {LOC}.", "located_in", "ORG", "LOC"),
    ("{PER} works at {ORG}.", "works_at", "PER", "ORG"),
    ("{ORG} was founded by {PER}.", "founded_by", "ORG", "PER"),
    ("{PER} visited {LOC} during the winter.", "visited", "PER", "LOC"),
    ("{PER} moved to {LOC} after college.", "moved_to", "PER", "LOC"),
    ("{ORG} partnered with {ORG2} on the project.", "partnered_with", "ORG", "ORG2"),
]
FILLER_TEMPLATES = [
    "The weather in {LOC} stayed pleasant all week.",
    "Residents of {LOC} gathered for the annual fair.",
    "{ORG} published its quarterly report.",
    "{PER} gave a short interview.",
    "Many people enjoy reading books in the evening.",
    "The committee will meet again next month.",
    "Local markets reported steady demand.",
]
NON_EN_SENTENCES = {
    "de": "Das Wetter war diese Woche angenehm und ruhig.",
    "fr": "Le temps est reste agreable toute la semaine.",
}

_TYPE_FOR_SLOT = {"PER": "PER", "ORG": "ORG", "ORG2": "ORG", "LOC": "LOC"}

HOT_DOMAINS = 3
N_DOMAINS = 50
GIANT_EVERY = 251
GIANT_FACTOR = 40
MEDIAN_SENTENCES = 6


def _org_variant(rng: random.Random, org: str) -> str:
    """Mild deterministic surface variants to exercise linking."""
    r = rng.random()
    if r < 0.10:
        return org + "."
    if r < 0.15 and org.endswith(" Corp"):
        return org + "oration"  # "Acme Corp" → "Acme Corporation"
    return org


def _fill(template: str, rng: random.Random) -> Tuple[str, List[Dict], List[Dict]]:
    """Instantiate a template. Returns (sentence, entities, gold_triples) with
    sentence-relative char offsets."""
    slots: Dict[str, str] = {}
    for slot in ("PER", "ORG", "ORG2", "LOC"):
        if "{" + slot + "}" in template:
            if slot == "PER":
                slots[slot] = rng.choice(PERSONS)
            elif slot == "LOC":
                slots[slot] = rng.choice(LOCS)
            else:
                slots[slot] = _org_variant(rng, rng.choice(ORGS))
    if "ORG" in slots and "ORG2" in slots and slots["ORG"] == slots["ORG2"]:
        slots["ORG2"] = ORGS[(ORGS.index(slots["ORG"]) + 1) % len(ORGS)] \
            if slots["ORG"] in ORGS else ORGS[0]
    sent = template
    entities = []
    # left-to-right substitution keeps offsets exact
    while True:
        first = None
        for slot in slots:
            pos = sent.find("{" + slot + "}")
            if pos >= 0 and (first is None or pos < first[1]):
                first = (slot, pos)
        if first is None:
            break
        slot, pos = first
        value = slots[slot]
        sent = sent[:pos] + value + sent[pos + len(slot) + 2:]
        entities.append(
            {"start": pos, "end": pos + len(value), "value": value,
             "entity": _TYPE_FOR_SLOT[slot]}
        )
    return sent, entities, slots


def gold_training_examples(n: int = 300, seed: str = "train") -> List[Dict]:
    """Annotated sentences for tagger training — same vocabularies/templates
    as the pages, so the tagger models the pipeline's domain."""
    templates = [t for t, *_ in RELATION_TEMPLATES] + FILLER_TEMPLATES
    return _examples_from(templates, n, seed)


def _examples_from(templates: List[str], n: int, seed: str) -> List[Dict]:
    out = []
    for i in range(n):
        rng = random.Random(f"{seed}-{i}")
        sent, entities, _ = _fill(templates[i % len(templates)], rng)
        out.append({"text": sent, "entities": entities})
    return out


def gold_split_examples(
    n_train: int = 160, n_dev: int = 80
) -> Tuple[List[Dict], List[Dict]]:
    """Template-DISJOINT train/dev split for an honest generalization gate:
    dev sentences come from structures the tagger never saw in training
    (and from a different fill seed), so memorizing training sentences
    cannot score — the tagger must generalize from context features."""
    train_templates = [t for t, *_ in RELATION_TEMPLATES[:7]] \
        + FILLER_TEMPLATES[:5]
    dev_templates = [t for t, *_ in RELATION_TEMPLATES[7:]] \
        + FILLER_TEMPLATES[5:]
    return (
        _examples_from(train_templates, n_train, "split-train"),
        _examples_from(dev_templates, n_dev, "split-dev"),
    )


def _page_rows(i: int) -> Dict:
    rng = random.Random(f"page-{i}")
    # hot-domain skew: ~30% of pages land on 3 domains
    if rng.random() < 0.30:
        domain = rng.randrange(HOT_DOMAINS)
    else:
        domain = rng.randrange(HOT_DOMAINS, N_DOMAINS)
    url = f"https://site{domain}.example/page/{i}"
    lang = "en"
    r = rng.random()
    if r < 0.03:
        lang = "de"
    elif r < 0.06:
        lang = "fr"

    n_sent = MEDIAN_SENTENCES + rng.randrange(-2, 5)
    if i % GIANT_EVERY == 0:
        n_sent *= GIANT_FACTOR

    sentences: List[str] = []
    gold: List[Dict] = []
    if lang == "en":
        for s in range(n_sent):
            srng = random.Random(f"page-{i}-s{s}")
            if srng.random() < 0.45:
                template, pred, subj_slot, obj_slot = RELATION_TEMPLATES[
                    srng.randrange(len(RELATION_TEMPLATES))
                ]
                sent, ents, slots = _fill(template, srng)
                sentences.append(sent)
                gold.append(
                    {
                        "subj": slots[subj_slot], "pred": pred,
                        "obj": slots[obj_slot],
                        "subj_type": _TYPE_FOR_SLOT[subj_slot],
                        "obj_type": _TYPE_FOR_SLOT[obj_slot],
                        "url": url,
                    }
                )
            else:
                template = FILLER_TEMPLATES[srng.randrange(len(FILLER_TEMPLATES))]
                sent, _, _ = _fill(template, srng)
                sentences.append(sent)
    else:
        sentences = [NON_EN_SENTENCES[lang]] * max(2, n_sent // 3)

    body = "\n".join(f"<p>{s}</p>" for s in sentences)
    html = (
        "<html><head><title>Page {i}</title><script>var t={i};</script>"
        "<style>p{{margin:0}}</style></head><body>"
        "<nav>Home | Archive | Contact</nav><header>Site {d}</header>"
        "{body}"
        "<footer>(c) example press</footer></body></html>"
    ).format(i=i, d=domain, body=body)
    text = extract_text(html)  # ground truth by construction
    ts = _dt.datetime(2024, 1, 1) + _dt.timedelta(seconds=i)
    return {
        "url": url, "warc_ts": ts, "html": html.encode("utf-8"),
        "text": text, "lang": lang, "gold": gold,
    }


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)
GOLD_SCHEMA = pa.schema(
    [
        ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
        ("subj_type", pa.string()), ("obj_type", pa.string()),
        ("url", pa.string()),
    ]
)


def generate_pages(
    n_pages: int,
    out_dir: str,
    rows_per_file: int = 2000,
    force: bool = False,
) -> Tuple[str, str]:
    """Write pages parquet (multiple files → parallel read) + gold triples.
    Returns (pages_dir, gold_path). Idempotent unless force."""
    import fcntl

    pages_dir = os.path.join(out_dir, "pages")
    gold_path = os.path.join(out_dir, "gold_triples.parquet")
    done_marker = os.path.join(out_dir, f".done-{n_pages}")
    if os.path.exists(done_marker) and not force:
        return pages_dir, gold_path
    os.makedirs(pages_dir, exist_ok=True)
    # cross-process guard: two callers must not generate the same fixture
    lock = open(os.path.join(out_dir, ".gen.lock"), "w")
    fcntl.flock(lock, fcntl.LOCK_EX)
    if os.path.exists(done_marker) and not force:
        lock.close()
        return pages_dir, gold_path
    # regenerating (different n_pages or force): stale part files from a
    # larger previous fixture would silently corrupt the corpus
    import shutil

    shutil.rmtree(pages_dir, ignore_errors=True)
    os.makedirs(pages_dir, exist_ok=True)
    for name in os.listdir(out_dir):
        if name.startswith(".done-"):
            os.remove(os.path.join(out_dir, name))
    gold_rows: List[Dict] = []
    for file_idx, start in enumerate(range(0, n_pages, rows_per_file)):
        rows = [_page_rows(i) for i in range(start, min(start + rows_per_file, n_pages))]
        for r in rows:
            gold_rows.extend(r.pop("gold"))
        table = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
        pq.write_table(table, os.path.join(pages_dir, f"part-{file_idx:05d}.parquet"))
    pq.write_table(pa.Table.from_pylist(gold_rows, schema=GOLD_SCHEMA), gold_path)
    with open(done_marker, "w") as f:
        f.write(str(n_pages))
    lock.close()
    return pages_dir, gold_path


def page_files(pages_dir: str) -> List[str]:
    return sorted(
        os.path.join(pages_dir, f)
        for f in os.listdir(pages_dir)
        if f.endswith(".parquet")
    )
