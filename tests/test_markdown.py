"""Markdown reader goldens, ported from /root/reference/tests/test_markdown.py."""

from spacy_crfsuite_ray.sources.markdown import read_markdown

EXAMPLE_MD = """## intent
    - what is my balance <!-- no entity -->
    - how much do I have on my [savings](source_account) <!-- entity "source_account" has value "savings" -->
    - how much do I have on my [savings account](source_account:savings) <!-- synonyms, method 1-->
    - Could I pay in [yen](currency)?  <!-- entity matched by lookup table -->"""


def test_read_markdown():
    assert read_markdown(EXAMPLE_MD) == [
        {"entities": [], "text": "what is my balance"},
        {
            "entities": [
                {"end": 32, "entity": "source_account", "start": 25, "value": "savings"}
            ],
            "text": "how much do I have on my savings",
        },
        {
            "entities": [
                {"end": 40, "entity": "source_account", "start": 25, "value": "savings"}
            ],
            "text": "how much do I have on my savings account",
        },
        {
            "entities": [{"end": 18, "entity": "currency", "start": 15, "value": "yen"}],
            "text": "Could I pay in yen?",
        },
    ]


def test_headers_filter():
    md = "## a\n- [x](t)\n## b\n- [y](t)"
    assert read_markdown(md, headers=["b"]) == [
        {"text": "y", "entities": [{"start": 0, "end": 1, "value": "y", "entity": "t"}]}
    ]


def test_multiple_entities_offset_correction():
    md = "- [a](t1) met [bb](t2) today"
    (ex,) = read_markdown(md)
    assert ex["text"] == "a met bb today"
    assert ex["entities"] == [
        {"start": 0, "end": 1, "value": "a", "entity": "t1"},
        {"start": 6, "end": 8, "value": "bb", "entity": "t2"},
    ]
