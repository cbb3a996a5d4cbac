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


def test_http_serve_parse_and_status():
    """End-to-end over loopback HTTP: the reference /parse + /status shapes
    (reference serve.py:63-93) from the stdlib handler."""
    import json
    import threading
    from http.client import HTTPConnection

    from spacy_crfsuite_ray.serve import make_server

    srv = make_server()
    host, port = srv.server_address
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        conn = HTTPConnection(host, port, timeout=30)
        conn.request("GET", "/status")
        status = json.loads(conn.getresponse().read())
        assert status["status"] == "OK"

        body = json.dumps({"text": ["Alice Martin works at Acme Corp.", ""]})
        conn.request("POST", "/parse", body,
                     {"Content-Type": "application/json"})
        out = json.loads(conn.getresponse().read())
        assert [d["text"] for d in out["data"]] == [
            "Alice Martin works at Acme Corp.", ""]
        values = {(e["value"], e["entity"])
                  for e in out["data"][0]["entities"]}
        assert ("Alice Martin", "PER") in values
        assert out["data"][1]["entities"] == []

        # single-string request wraps into a one-element list (ref parity)
        conn.request("POST", "/parse", json.dumps({"text": "Acme Corp"}),
                     {"Content-Type": "application/json"})
        single = json.loads(conn.getresponse().read())
        assert len(single["data"]) == 1

        conn.request("POST", "/parse", "notjson")
        assert conn.getresponse().status == 400
        # malformed-but-valid-JSON bodies must 400, never drop the connection
        for bad in ("[1,2]", '{"text": 5}', '{"text": null}',
                    '{"text": [1]}', "{}"):
            conn.request("POST", "/parse", bad,
                         {"Content-Type": "application/json"})
            assert conn.getresponse().status == 400, bad
        conn.request("GET", "/nope")
        assert conn.getresponse().status == 404
    finally:
        srv.shutdown()
        srv.server_close()


def test_tokenizer_abc_extension_point():
    class Upper(Tokenizer):
        def tokenize(self, message, attribute="text"):
            message["tokens"] = message[attribute].upper().split()

    msg = {"text": "a b"}
    Upper().tokenize(msg)
    assert msg["tokens"] == ["A", "B"]
    assert isinstance(RegexTokenizer(), Tokenizer)


def test_http_serve_concurrent_requests():
    """Concurrent /parse requests must all succeed with correct results
    (inference serialized over the shared warm tagger)."""
    import json
    import threading
    from http.client import HTTPConnection

    from spacy_crfsuite_ray.serve import make_server

    srv = make_server()
    host, port = srv.server_address
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    results, errors = [], []

    def one(i):
        try:
            c = HTTPConnection(host, port, timeout=60)
            c.request("POST", "/parse",
                      json.dumps({"text": "Alice Martin works at Acme Corp."}),
                      {"Content-Type": "application/json"})
            r = c.getresponse()
            assert r.status == 200
            out = json.loads(r.read())
            vals = {e["value"] for e in out["data"][0]["entities"]}
            results.append("Alice Martin" in vals)
        except Exception as exc:
            errors.append(exc)

    threads = [threading.Thread(target=one, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    srv.shutdown()
    srv.server_close()
    assert not errors and len(results) == 8 and all(results)
