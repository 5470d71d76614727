"""Pluggable sheet sources (S1-S4)."""

from .sheet_source import FixtureSheetSource, SheetSource, SpreadsheetMeta

__all__ = ["SheetSource", "FixtureSheetSource", "SpreadsheetMeta"]
