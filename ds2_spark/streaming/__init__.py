"""Structured Streaming demos + the batch engine's streaming posture."""
