#!/usr/bin/env python
"""One-off evidence run (round-10 directive #5): beam vs HNSW
visited fractions at MATCHED recall on a >=10^4-node cell — the
scale regime where the hierarchy's entry-quality win is claimed
(similarity.py cosine_topk_hnsw defers the asymptotic claim to this
experiment; gate-scale cells were cost-neutral).

Corpus: sf0.1 embeddings (2000 x 64) expanded x8 with small
deterministic perturbations -> 16 000 vectors in ONE cell
(n_cells=1). Queries: 48 of the original vectors. Ground truth:
exact brute-force cosine top-10 in numpy. For each ef, run the flat
beam and HNSW with include_stats=True, compute recall@10 from the
locally-kept rows and the mean scored fraction from n_visited.

Results land in SCALE.md (round-10 section). Not a registered query:
this is evidence, not a gate.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
EXPAND = 8
K = 10
N_QUERIES = 48
EF_SETTINGS = (16, 64, 128)
M_NEIGHBORS = 8


def main() -> None:
    import duckdb

    from google_sheets_etl_spark.session import get_spark

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    base = np.array([r[1] for r in rows], dtype=np.float64)
    n0, dim = base.shape
    rng = np.random.default_rng(42)  # deterministic one-off
    vecs = np.repeat(base, EXPAND, axis=0) + rng.normal(
        0, 0.02, size=(n0 * EXPAND, dim)
    )
    n = len(vecs)
    qidx = np.arange(0, n, n // N_QUERIES)[:N_QUERIES]
    qmat = vecs[qidx]

    norms = np.linalg.norm(vecs, axis=1)
    qn = np.linalg.norm(qmat, axis=1)
    cos = (qmat @ vecs.T) / (qn[:, None] * norms[None, :])
    u6 = np.floor(cos * 1e6 + 0.5).astype(np.int64)
    truth = {}
    for i, qi in enumerate(qidx):
        order = np.lexsort((np.arange(n), -u6[i]))
        truth[int(qi)] = set(int(x) for x in order[:K])

    spark = get_spark("hnsw-evidence")
    spark.sparkContext.setLogLevel("ERROR")
    cand = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(4).cache()
    qs = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in qidx],
        "vec_id long, embedding array<double>",
    ).cache()
    cand.count(), qs.count()

    from google_sheets_etl_spark.operators.similarity import (
        cosine_topk_hnsw, cosine_topk_nsw_beam,
    )

    print(f"cell_n={n} dim={dim} k={K} m={M_NEIGHBORS} "
          f"queries={N_QUERIES}")
    print(f"{'algo':6} {'ef':>4} {'recall@10':>10} {'visited':>9} "
          f"{'frac':>8}")
    for ef in EF_SETTINGS:
        for label, fn in (("beam", cosine_topk_nsw_beam),
                          ("hnsw", cosine_topk_hnsw)):
            out = fn(
                qs, cand, k=K, n_cells=1, n_probe=1,
                m_neighbors=M_NEIGHBORS, ef=ef,
                include_stats=True, max_cell_nodes=n,
            ).collect()
            per_q: dict[int, list] = {}
            visited: dict[int, int] = {}
            for r in out:
                per_q.setdefault(r["query_id"], []).append(
                    (r["cos"] if r["cos"] is not None else -2.0,
                     r["neighbor_id"])
                )
                visited[r["query_id"]] = r["n_visited"]
            hits = tot = 0
            for qi, lst in per_q.items():
                lst.sort(key=lambda t: (-t[0], t[1]))
                got = set(nid for _, nid in lst[:K])
                hits += len(got & truth[qi])
                tot += K
            mv = sum(visited.values()) / max(len(visited), 1)
            print(f"{label:6} {ef:>4} {hits / tot:>10.3f} "
                  f"{mv:>9.0f} {mv / n:>8.3f}")


if __name__ == "__main__":
    main()
