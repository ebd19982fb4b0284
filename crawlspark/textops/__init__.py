"""Training-data pipeline text operators over the documents table:
deduplication (exact, minhash+LSH, simhash, n-gram Jaccard), language-id,
quality scoring, token counting, document fingerprinting."""
