"""Query side of the engine: exact-join BM25 scorer (the correctness
baseline) and block-max WAND over compressed postings (the fast path)."""
