"""Large-scale training-data pipeline operators over the fulltext tables.

These are first-class components alongside the search engine: exact and
near-duplicate detection, similarity search over embeddings, text analysis,
and multimodal column plumbing — every operator designed for the
100 TB / 1000-executor shape (partial aggregation, broadcast-joined small
sides, bucket-join LSH instead of all-pairs, no driver-side loops).
"""
