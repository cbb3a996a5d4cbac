"""Training-data pipeline operators over the testdata tables
(documents / embeddings / events / TPC-H-ish): text analysis, dedup family,
similarity search, multimodal plumbing, relational showcase ops."""
