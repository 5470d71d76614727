#!/usr/bin/env python
"""Time ONE registered query N times (min + all times) — the bisect
probe for drift attribution. Usage:
    python tools/one_query_bench.py <query_name> [iters] [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from google_sheets_etl_spark.queries import QUERIES  # noqa: E402
from google_sheets_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark("one-query-bench")
    spark.sparkContext.setLogLevel("ERROR")
    import pandas as _pd  # noqa: F401
    spark.range(1000, numPartitions=32).selectExpr("sum(id)").collect()
    spark.range(1000, numPartitions=32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()
    fn = QUERIES[name]
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        times.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    print(f"{name}: min={min(times)} times={times} "
          f"loadavg={[round(x, 2) for x in os.getloadavg()]}")


if __name__ == "__main__":
    main()
