"""LLM training-data pipeline operators (extension beyond reference
parity, per SURVEY.md §7 step 7): text analysis, deduplication,
similarity search, multimodal column plumbing."""
