"""Relational/dataflow operators: the 4 pipeline stages, upsert/merge,
dedup family, similarity search, multimodal column plumbing."""
