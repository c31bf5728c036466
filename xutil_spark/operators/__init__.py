"""DataFrame-composition operators: spatial joins, kNN, dedup, similarity."""
