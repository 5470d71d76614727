"""Stateful table layer: accounting state + target tables (SURVEY.md §2.5)."""
