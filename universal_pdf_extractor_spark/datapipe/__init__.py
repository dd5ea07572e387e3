"""Large-scale training-data pipeline operators.

Deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
approximate similarity search over embeddings, text analysis
(language id, quality scoring, token counting, fingerprinting), and
multimodal binary-column plumbing.
"""
