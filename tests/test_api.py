"""Batch/document inference API (serve.py + spaCy-component parity)."""

from spacy_crfsuite_ray.api import parse_document, parse_texts
from spacy_crfsuite_ray.core.tokenizer import RegexTokenizer, Tokenizer


def test_parse_texts_shape():
    out = parse_texts(["Alice Martin works at Acme Corp.", ""])
    assert out[0]["text"].startswith("Alice")
    values = {(e["value"], e["entity"]) for e in out[0]["entities"]}
    assert ("Alice Martin", "PER") in values
    assert ("Acme Corp", "ORG") in values
    assert out[1]["entities"] == []


def test_parse_document_absolute_offsets():
    text = "Alice Martin works at Acme Corp. Bob Okafor was born in Lakeside."
    doc = parse_document(text)
    assert doc["text"] == text
    for e in doc["entities"]:
        assert text[e["start"]:e["end"]] == e["value"]
    values = {e["value"] for e in doc["entities"]}
    assert {"Alice Martin", "Acme Corp", "Bob Okafor", "Lakeside"} <= values


def test_tokenizer_abc_extension_point():
    class Upper(Tokenizer):
        def tokenize(self, message, attribute="text"):
            message["tokens"] = message[attribute].upper().split()

    msg = {"text": "a b"}
    Upper().tokenize(msg)
    assert msg["tokens"] == ["A", "B"]
    assert isinstance(RegexTokenizer(), Tokenizer)
