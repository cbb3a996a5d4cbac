"""CoNLL reader goldens, ported from /root/reference/tests/test_conll.py."""

from spacy_crfsuite_ray.sources.conll import parse_conll

CONLL_03 = """The DT B-NP O
European NNP I-NP B-ORG
Commission NNP I-NP I-ORG
said VBD B-VP O
. . O O"""


def test_parse_conll_block():
    example = next(parse_conll(CONLL_03.split("\n")))
    assert example["text"] == "The European Commission said ."
    assert example["tokens"][0].text == "The"
    assert example["tokens"][0].start == 0
    assert example["tokens"][0].get("pos") == "DT"
    assert example["tokens"][1].text == "European"
    assert example["tokens"][1].start == 4
    assert example["tokens"][1].get("pos") == "NNP"
    # non-O tags become single-token entities (reference conll.py:71-79)
    assert example["entities"] == [
        {"value": "European", "entity": "B-ORG", "start": 4, "end": 12},
        {"value": "Commission", "entity": "I-ORG", "start": 13, "end": 23},
    ]


def test_blank_line_splits_and_docstart_skipped():
    lines = ["-DOCSTART- -X- O O", "", "a A O", "b B O", "", "c C O", ""]
    blocks = list(parse_conll(lines))
    assert len(blocks) == 2
    assert blocks[0]["text"] == "a b"
    assert blocks[1]["text"] == "c"


def test_conll_02_three_columns():
    (ex,) = list(parse_conll(["Wolff NNP B-PER", "works VBZ O"]))
    assert ex["entities"][0]["entity"] == "B-PER"
