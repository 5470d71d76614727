"""Structured Streaming extension (the reference is batch-polling only,
SURVEY.md §2.7 — streaming ingest is a north-star addition)."""
