"""Structured Streaming surface: the same event transformations as the
batch gate queries, expressed once and runnable in either mode."""
