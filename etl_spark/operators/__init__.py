"""Training-data pipeline operators: dedup families, similarity search,
text analysis, multimodal plumbing. All JVM-side expressions except where
an algorithm is inherently numeric (numpy via Arrow-batched pandas UDFs)."""
