"""spacy_crfsuite_ray — a Ray-Data-native knowledge-graph construction engine.

A brand-new engine (NOT a port) with the query/data-processing capabilities of
the reference library talmago/spacy_crfsuite (see /root/reference), re-expressed
Ray-Data-first:

- ``core/``      pure single-process semantics (tokenizer, BILOU, featurizer,
                 numpy linear-chain CRF, span decode, HTML extraction, relation
                 patterns, linking). This is the correctness oracle.
- ``sources/``   readers: markdown / CoNLL gold formats, synthetic pages fixture.
- ``stages/``    Ray Data batch UDFs and actor-pool stages.
- ``pipelines/`` end-to-end Dataset pipeline assembly (KG construction, dedup,
                 similarity search, text analysis).
- ``functions/`` vectorized scalar helpers (hashing, minhash, simhash, text stats).
- ``state/``     model artifacts (CRF model save/load, broadcast helpers).

Nothing here calls ``ray.init()``; sessions are owned by bench/CLI/test fixtures.
"""

__version__ = "0.1.0"
