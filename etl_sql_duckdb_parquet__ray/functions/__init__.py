"""Training-data-pipeline operators beyond the reference's surface:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + IVF), text analysis
(language-ID, quality, tokens, fingerprints) and multimodal plumbing."""
