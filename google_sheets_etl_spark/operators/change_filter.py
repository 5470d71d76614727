"""The change filter (J2+J3): which configured jobs need a (re)load?

The reference answers this with a SQL left-join + row-value ``IN``
returning *up-to-date* jobs, then a PHP set-difference keeping the rest
(``src/DatabaseAgentMysql.php:52-87``). Both halves collapse into one
Catalyst-native ``left_anti`` join here (SURVEY.md §2.3 J2/J3):

    configured jobs  ANTI JOIN  up-to-date jobs
    where up-to-date = etl_jobs ⋈ spreadsheets ON spreadsheet_id
                       AND loaded google_modified == seen google_modified

A job is extractable when it was never loaded OR its spreadsheet's
seen ``google_modified`` differs from the one recorded at last load.

Scale: configs and accounting are metadata tables (≤ millions of rows,
small relative to data) — Catalyst picks broadcast-hash for both joins
automatically; the explicit ``broadcast`` hint pins that choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def up_to_date_jobs(spreadsheets: DataFrame, etl_jobs: DataFrame) -> DataFrame:
    """J2 (SQL half): configured pairs whose recorded load matches the
    currently-seen ``google_modified`` (``DatabaseAgentMysql.php:64-71``)."""
    return (
        etl_jobs.alias("j")
        .join(
            F.broadcast(spreadsheets.alias("s")),
            F.col("j.spreadsheet_id") == F.col("s.id"),
            "inner",
        )
        .filter(F.col("j.google_modified") == F.col("s.google_modified"))
        .select(
            F.col("s.google_spreadsheet_id").alias("google_spreadsheet_id"),
            F.col("j.sheet_name").alias("sheet_name"),
        )
    )


def filter_extractable(
    configured: DataFrame, spreadsheets: DataFrame, etl_jobs: DataFrame
) -> DataFrame:
    """J2+J3 as a single ``left_anti``: configured jobs *not* in the
    up-to-date set (the reference's PHP hash-map filter,
    ``DatabaseAgentMysql.php:75-86``, folded into the plan)."""
    current = up_to_date_jobs(spreadsheets, etl_jobs)
    return configured.join(
        F.broadcast(current),
        on=["google_spreadsheet_id", "sheet_name"],
        how="left_anti",
    )
