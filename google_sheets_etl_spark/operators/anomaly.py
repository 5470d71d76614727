"""Change detection over event-time series — the monitoring
primitive a continuously-ingesting pipeline runs next to its
accounting: has a key's rate shifted from its reference behavior?

``rate_change_cusum`` is the classic one-sided CUSUM (Page 1954,
"Continuous Inspection Schemes") made engine-exact: per key the
hourly counts fold through

    S_t = max(0, S_{t-1} + (x_t − μ_ref))

and an alarm raises when S exceeds a threshold. The reference mean
μ_ref is rational (reference-window total / width), so the fold runs
SCALED BY the reference width n_ref:

    S'_t = max(0, S'_{t-1} + n_ref·x_t − total_ref)

— all int64, no division ever happens, and the alarm test
``S'_t > h·total_ref`` is an integer comparison: bit-identical on any
engine, which is what lets a recursive-CTE oracle certify a
sequential fold.

Scale shape: the heavy input reduces FIRST (one grouped aggregation
to (key, hour) counts — the only corpus-sized shuffle); the fold is
inherently sequential PER KEY, so it runs as one Arrow task per key
over the already-reduced series (thousands of rows per key, millions
of keys in parallel — the applyInPandasWithState/sessionization
grain). The reference stats are a per-key scalar join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rate_change_cusum(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    ref_hours: int = 48,
    alarm_mult: int = 3,
) -> DataFrame:
    """One-sided CUSUM over hourly counts per key. The first
    ``ref_hours`` DISTINCT hours of each key's series define the
    reference (total_ref over n_ref ≤ ref_hours hours); the scaled
    fold then runs over the WHOLE series (reference hours included —
    drift inside the reference window shows too). Returns
    ``(key, hour, n, cusum_scaled, alarm)`` where
    ``alarm = cusum_scaled > alarm_mult·total_ref``. Keys with an
    empty series emit nothing; n_ref comes from the data, not the
    parameter, so short series stay well-defined.

    This is the zero-slack form (textbook CUSUM adds an allowance k
    to drain the statistic at reference rate; with k = 0 a past burst
    holds S until BELOW-reference hours drain it) — chosen because
    the zero-slack fold needs no second tuning parameter and the
    alarm column is about surfacing that a shift HAPPENED, which the
    held statistic makes auditable after the fact."""
    import pandas as pd

    hourly = (
        events.select(
            F.col(key_col).alias("key"),
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
        )
        .groupBy("key", "hour")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    key_type = dict(hourly.dtypes)["key"]
    hour_type = dict(hourly.dtypes)["hour"]  # timestamp OR ntz — keep

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("hour").reset_index(drop=True)
        n_ref = min(ref_hours, len(pdf))
        total_ref = int(pdf["n"].iloc[:n_ref].sum())
        s, out = 0, []
        for x in pdf["n"]:
            s = max(0, s + n_ref * int(x) - total_ref)
            out.append(s)
        pdf["cusum_scaled"] = pd.Series(out, dtype="int64")
        pdf["alarm"] = pdf["cusum_scaled"] > alarm_mult * total_ref
        return pdf

    return hourly.groupBy("key").applyInPandas(
        fold,
        f"key {key_type}, hour {hour_type}, n long, "
        "cusum_scaled long, alarm boolean",
    )
