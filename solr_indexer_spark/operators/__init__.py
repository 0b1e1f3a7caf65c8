"""Training-data pipeline operators: deduplication, similarity search,
text analysis, multimodal plumbing — the large-scale corpus-curation
layer a 100 TB web corpus needs on top of the search engine."""
