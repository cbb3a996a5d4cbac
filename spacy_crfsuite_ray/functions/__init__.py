"""Vectorized / deterministic scalar helpers shared by stages and pipelines."""
