"""Data layer: dataset, bucketed batching, collaters, tokenization."""
