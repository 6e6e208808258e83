"""Column-level building blocks: text quality, scrubbing, vectors, scores."""
