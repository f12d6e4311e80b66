"""Inverted-index build + BM25 query engine (the Katta capability core)."""
