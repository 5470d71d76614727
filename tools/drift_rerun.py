#!/usr/bin/env python
"""Cross-round drift attribution: idle-machine re-run of the queries
that drifted between two bench rounds with ZERO source change on
their paths, at 3 iterations each, recording loadavg before/after.

Usage: python tools/drift_rerun.py [sf_dir] > DRIFT_r09.json
       DRIFT_ROUND=r10 python tools/drift_rerun.py [sf_dir] > DRIFT_r10.json
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from google_sheets_etl_spark.queries import QUERIES  # noqa: E402
from google_sheets_etl_spark.session import get_spark  # noqa: E402

# the drifted common-set queries from the r8 verdict, plus two stable
# anchors (events_hourly, cosine_topk) to detect machine-wide noise
TARGETS = [
    "typed_profile_incremental",
    "near_dup_clusters_lsh",
    "bpe_learn_merges",
    "near_dup_lsh",
    "dedup_keep_best_quality",
    "incremental_near_dup_admission",
    "typed_view_cast_stats",
    "incremental_dedup_clusters",
    "incremental_embedding_admission",
    "bpe_doc_token_counts",
    "image_dhash_near_dup",
    "typed_view_apply",
    # anchors (r7≈r8, no code change): control for machine noise
    "events_hourly",
    "cosine_topk",
]

R7 = {"typed_profile_incremental": 3.57, "near_dup_clusters_lsh": 2.54,
      "bpe_learn_merges": 6.53, "near_dup_lsh": 1.76,
      "dedup_keep_best_quality": 3.53, "incremental_near_dup_admission": 1.90,
      "typed_view_cast_stats": 2.81, "incremental_dedup_clusters": 5.23,
      "incremental_embedding_admission": 1.08, "bpe_doc_token_counts": 2.50,
      "image_dhash_near_dup": 4.60, "typed_view_apply": 4.56}
R8 = {"typed_profile_incremental": 6.16, "near_dup_clusters_lsh": 4.09,
      "bpe_learn_merges": 7.79, "near_dup_lsh": 2.73,
      "dedup_keep_best_quality": 4.38, "incremental_near_dup_admission": 2.58,
      "typed_view_cast_stats": 3.40, "incremental_dedup_clusters": 5.76,
      "incremental_embedding_admission": 1.60, "bpe_doc_token_counts": 2.96,
      "image_dhash_near_dup": 5.04, "typed_view_apply": 4.97}


# round-10 drifted cogroup rows (VERDICT.md round 10, "What's wrong"
# #2: +0.8-2.3 s vs r9 with zero source change), plus the same two
# stable anchors
TARGETS_R10 = [
    "suffix_dedup_spans",
    "suffix_dedup_apply",
    "near_dup_clusters_lsh",
    "simgraph_pagerank",
    "incremental_near_dup_admission",
    "typed_profile_incremental",
    "bpe_learn_merges",
    # anchors: control for machine-wide noise
    "events_hourly",
    "cosine_topk",
]

R9 = {"suffix_dedup_spans": 5.25, "suffix_dedup_apply": 5.60,
      "near_dup_clusters_lsh": 2.39, "simgraph_pagerank": 4.56,
      "incremental_near_dup_admission": 1.63,
      "typed_profile_incremental": 3.86, "bpe_learn_merges": 6.02}
R10 = {"suffix_dedup_spans": 7.50, "suffix_dedup_apply": 6.85,
       "near_dup_clusters_lsh": 3.44, "simgraph_pagerank": 5.53,
       "incremental_near_dup_admission": 2.50,
       "typed_profile_incremental": 4.63, "bpe_learn_merges": 7.18}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rnd = os.environ.get("DRIFT_ROUND", "r9")
    targets = TARGETS_R10 if rnd == "r10" else TARGETS
    base_lo, base_hi = (R9, R10) if rnd == "r10" else (R7, R8)
    iters = int(os.environ.get("DRIFT_ITERS", "3"))
    spark = get_spark("drift-rerun")
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.py
    import pandas as _pd  # noqa: F401
    spark.range(1000, numPartitions=32).selectExpr("sum(id)").collect()
    spark.range(1000, numPartitions=32).mapInPandas(
        lambda it: it, "id long").selectExpr("count(*)").collect()

    load_before = os.getloadavg()
    out = {}
    for name in targets:
        fn = QUERIES[name]
        times = []
        for _ in range(iters):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.monotonic() - t0, 3))
        out[name] = {"times": times, "min": min(times),
                     "median": sorted(times)[len(times) // 2],
                     "prior": base_lo.get(name),
                     "drifted": base_hi.get(name)}
        print(f"  {name}: {times}  (prior={base_lo.get(name)}"
              f" drifted={base_hi.get(name)})",
              file=sys.stderr)
    load_after = os.getloadavg()
    print(json.dumps({"round": rnd, "sf_dir": sf_dir, "iters": iters,
                      "loadavg_before": load_before,
                      "loadavg_after": load_after,
                      "results": out}))


if __name__ == "__main__":
    main()
