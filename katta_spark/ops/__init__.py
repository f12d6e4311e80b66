"""Large-scale training-data pipeline operators over the corpus
substrate: deduplication, similarity search, text analysis,
multimodal plumbing."""
