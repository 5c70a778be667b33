"""Engine operators: key assignment, dedup, similarity, text analysis."""
