"""read_file dispatcher + CLI round trips."""

import json
import os

import pytest

from spacy_crfsuite_ray.sources.readers import read_file


MD = "## intent\n- show me [chinese](cuisine) food\n"


def test_read_file_md(tmp_path):
    p = tmp_path / "gold.md"
    p.write_text(MD)
    (ex,) = read_file(str(p))
    assert ex["text"] == "show me chinese food"
    assert ex["entities"][0]["entity"] == "cuisine"


def test_read_file_json_jsonl(tmp_path):
    examples = [{"text": "hi", "entities": []}]
    pj = tmp_path / "a.json"
    pj.write_text(json.dumps(examples))
    assert read_file(str(pj)) == examples
    pl = tmp_path / "a.jsonl"
    pl.write_text("\n".join(json.dumps(e) for e in examples))
    assert read_file(str(pl)) == examples


def test_read_file_yaml(tmp_path):
    p = tmp_path / "nlu.yml"
    p.write_text(
        "nlu:\n"
        "- intent: restaurant_search\n"
        "  examples: |\n"
        "    - find [thai](cuisine) places\n"
    )
    (ex,) = read_file(str(p))
    assert ex["text"] == "find thai places"


def test_read_file_conll(tmp_path):
    p = tmp_path / "x.conll"
    p.write_text("Wolff NNP B-PER\nworks VBZ O\n")
    (ex,) = read_file(str(p))
    assert ex["text"] == "Wolff works"


def test_read_file_unknown_ext(tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("a,b")
    with pytest.raises(ValueError, match="Unsupported"):
        read_file(str(p))


def test_cli_train_eval_tag_roundtrip(tmp_path, capsys):
    from spacy_crfsuite_ray.cli import main

    gold = tmp_path / "gold.md"
    gold.write_text(
        "## intent\n"
        "- show me [chinese](cuisine) restaurants\n"
        "- find a [mexican](cuisine) place in the [north](location)\n"
        "- any [thai](cuisine) spot in the [south](location)\n"
        "- i want [italian](cuisine) food in the [east](location)\n"
    )
    out = tmp_path / "model"
    assert main(["train", str(gold), "-o", str(out)]) == 0
    model = os.path.join(str(out), "model.npz")
    assert os.path.exists(model)
    assert main(["eval", str(gold), "-m", model]) == 0
    report = capsys.readouterr().out
    assert "weighted avg" in report
    assert main(["tag", "show me chinese restaurants", "-m", model]) == 0
    tagged = json.loads(capsys.readouterr().out)
    assert tagged[0]["value"] == "chinese"
    assert tagged[0]["entity"] == "cuisine"


def test_convert_reference_weights_roundtrip(tmp_path):
    """The reference-weights converter must produce an npz whose inference
    matches the source weights exactly (round-trip through the
    sklearn_crfsuite {(attr, label): w} public format)."""
    from spacy_crfsuite_ray.core.crf import LinearChainCRF
    from spacy_crfsuite_ray.state.model import convert_reference_weights

    X = [
        [{"0:low": "alice", "0:title": True}, {"0:low": "works"}],
        [{"0:low": "acme"}, {"0:low": "corp"}],
    ]
    y = [["U-PER", "O"], ["B-ORG", "L-ORG"]]
    src = LinearChainCRF().fit(X, y, c1=0.0, c2=0.01, max_iterations=50)

    # export in the reference's public attribute format
    inv = {i: a for a, i in src.vocab.items()}
    state = {
        (inv[f], lab): src.W[f, j]
        for f in range(src.W.shape[0])
        for j, lab in enumerate(src.labels)
        if src.W[f, j] != 0.0
    }
    trans = {
        (a, b): src.T[i, j]
        for i, a in enumerate(src.labels)
        for j, b in enumerate(src.labels)
        if src.T[i, j] != 0.0
    }
    out = str(tmp_path / "converted.npz")
    convert_reference_weights(state, trans, src.labels, out)
    loaded = LinearChainCRF.load(out)

    for sent in X:
        assert loaded.predict_single(sent) == src.predict_single(sent)
        a = loaded.predict_marginals_single(sent)
        b = src.predict_marginals_single(sent)
        for da, db in zip(a, b):
            for k in db:
                assert abs(da[k] - db[k]) < 1e-9
