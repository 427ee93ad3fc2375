"""Relational-level operators: range/interval joins, deduplication,
similarity search, text analysis, multimodal plumbing, pairwise
trajectory ops. These are DataFrame→DataFrame combinators (vs.
functions/, which are Column-level)."""
