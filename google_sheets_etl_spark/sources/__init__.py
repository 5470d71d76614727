"""Pluggable sheet sources (S1-S4)."""

from .sheet_source import FixtureSheetSource, SheetSource, SpreadsheetMeta
from .spark_datasource import SheetsDataSource

__all__ = ["SheetSource", "FixtureSheetSource", "SpreadsheetMeta", "SheetsDataSource"]
