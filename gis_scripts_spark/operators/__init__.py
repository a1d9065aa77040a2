"""Engine operators: cell-keyed joins, tiling, aggregation, kNN, dedup,
similarity, text analysis."""
