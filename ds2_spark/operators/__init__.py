"""Multi-stage operators: audio sanity, HOC, votes, kNN, selection, dedup, ANN."""
