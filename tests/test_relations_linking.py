"""Relation patterns + linking/canonicalization goldens."""

from spacy_crfsuite_ray.core.linking import (
    block_keys,
    link_mentions,
    normalize_surface,
)
from spacy_crfsuite_ray.core.relations import extract_relations
from spacy_crfsuite_ray.functions import hashing


def ent(text, value, type_):
    start = text.index(value)
    return {
        "start": start, "end": start + len(value),
        "value": value, "entity": type_, "confidence": 0.9,
    }


def test_president_of_pattern():
    text = "Alice Smith, president of Acme Corp, spoke."
    ents = [ent(text, "Alice Smith", "PER"), ent(text, "Acme Corp", "ORG")]
    (t,) = extract_relations(text, ents, url="u1")
    assert (t["subj"], t["pred"], t["obj"]) == ("Alice Smith", "president_of", "Acme Corp")
    assert (t["subj_type"], t["obj_type"], t["url"]) == ("PER", "ORG", "u1")


def test_born_in_and_acquired():
    text = "Bob was born in Paris. Acme acquired Initech."
    ents = [
        ent(text, "Bob", "PER"), ent(text, "Paris", "LOC"),
        ent(text, "Acme", "ORG"), ent(text, "Initech", "ORG"),
    ]
    triples = extract_relations(text, ents)
    preds = {(t["subj"], t["pred"], t["obj"]) for t in triples}
    assert ("Bob", "born_in", "Paris") in preds
    assert ("Acme", "acquired", "Initech") in preds


def test_no_pattern_no_triple_and_gap_limit():
    text = "Alice " + ("x " * 50) + "acquired Acme"
    ents = [ent(text, "Alice", "PER"), ent(text, "Acme", "ORG")]
    assert extract_relations(text, ents) == []


def test_normalize_and_block_keys_stable():
    assert normalize_surface("  Acme,  Corp. ") == "acme corp"
    assert block_keys("Acme Corp") == block_keys("acme corp!")
    # near-identical strings share at least one band key
    shared = set(block_keys("acme corporation")) & set(block_keys("acme corporatian"))
    assert shared


def test_link_mentions_clusters_near_duplicates():
    mentions = [
        ("Acme Corp", "ORG"), ("Acme Corp", "ORG"), ("Acme Corp.", "ORG"),
        ("acme corp", "ORG"), ("Zeta Ltd", "ORG"),
        ("Acme Corp", "PER"),  # different type → independent cluster
    ]
    mapping = link_mentions(mentions)
    canon = mapping[("Acme Corp", "ORG")]
    assert mapping[("Acme Corp.", "ORG")] == canon
    assert mapping[("acme corp", "ORG")] == canon
    assert mapping[("Zeta Ltd", "ORG")] != canon
    assert mapping[("Acme Corp", "PER")] == "acme corp"


def test_deterministic_ids():
    assert hashing.node_id("acme corp", "ORG") == hashing.node_id("acme corp", "ORG")
    assert len(hashing.node_id("a", "T")) == 16
    assert hashing.edge_id("a", "p", "b") != hashing.edge_id("b", "p", "a")


def test_minhash_similarity_monotonic():
    a = hashing.minhash_signature(hashing.char_shingles("the quick brown fox jumps"))
    b = hashing.minhash_signature(hashing.char_shingles("the quick brown fox jumped"))
    c = hashing.minhash_signature(hashing.char_shingles("completely different words"))
    sim_ab = (a == b).mean()
    sim_ac = (a == c).mean()
    assert sim_ab > sim_ac


def test_simhash_hamming():
    a = hashing.simhash64("the quick brown fox".split())
    b = hashing.simhash64("the quick brown foxes".split())
    c = hashing.simhash64("entirely unrelated content here".split())
    assert hashing.hamming64(a, b) < hashing.hamming64(a, c)


def test_rolling_fingerprint_shift_invariant_window():
    fp1 = set(hashing.rolling_fingerprint("abcdefghij klmnopqrst uvwxyz 123456"))
    fp2 = set(hashing.rolling_fingerprint("PREFIX abcdefghij klmnopqrst uvwxyz 123456"))
    # shared substrings produce shared fingerprints
    assert fp1 & fp2
