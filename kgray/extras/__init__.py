"""Large-scale training-data operators beyond the reference's surface:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), ANN similarity search, text analysis, and
multimodal binary-column plumbing. All Ray-Data-first; see each
module's scale notes."""
