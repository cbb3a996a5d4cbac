"""HTML extraction + sentence splitting goldens."""

from spacy_crfsuite_ray.core.html import extract_text
from spacy_crfsuite_ray.core.sentences import MAX_SENT_CHARS, split_sentences


def test_extract_drops_boilerplate_and_script():
    html = (
        b"<html><head><title>T</title><style>p{}</style>"
        b"<script>var x=1;</script></head>"
        b"<body><nav>Home | About</nav>"
        b"<p>Hello &amp; welcome.</p><div>Second block.</div>"
        b"<!-- hidden --><footer>(c) 2026</footer></body></html>"
    )
    text = extract_text(html)
    assert "Hello & welcome." in text
    assert "Second block." in text
    assert "var x" not in text
    assert "Home | About" not in text
    assert "(c) 2026" not in text
    assert "hidden" not in text


def test_extract_deterministic_and_str_input():
    html = "<p>a</p><p>b</p>"
    assert extract_text(html) == extract_text(html.encode()) == "a\n\nb"


def test_split_sentences_offsets():
    text = "Alice went home. Bob stayed.\nCarol left."
    sents = split_sentences(text)
    assert [s for _, s in sents] == ["Alice went home.", "Bob stayed.", "Carol left."]
    for off, s in sents:
        assert text[off:off + len(s)] == s


def test_split_caps_giant_sentences():
    text = "x" * (MAX_SENT_CHARS * 2 + 10)
    sents = split_sentences(text)
    assert len(sents) == 3
    assert all(len(s) <= MAX_SENT_CHARS for _, s in sents)
    assert sum(len(s) for _, s in sents) == len(text)
