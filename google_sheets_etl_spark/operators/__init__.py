"""DataFrame-level operators (SURVEY.md §2)."""
