"""Web-scale training-data operators over the documents/embeddings tables:
dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity search,
text analysis (lang-ID, quality, tokens, fingerprints), multimodal plumbing.
"""
