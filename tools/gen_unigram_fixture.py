#!/usr/bin/env python
"""Regenerate the literal-expected unigram hard-EM fixture — the
regenerated-ground-truth discipline (multimodal codecs, PCA, BPE
k=200): an INDEPENDENT pure-Python implementation pins the trained
piece table, and a freshness test fails if the committed fixture
drifts from a live regeneration.

``reference_hard_em`` re-derives everything from the corpus with its
own code: word frequencies, the char-cover + top-k substring init
vocabulary with half-up −ln(p) micro-unit costs, and two Viterbi-EM
rounds (count pieces of each word's best segmentation, add-one smooth,
re-estimate, prune unused multi-char pieces). The Viterbi tie-break
CONTRACT is shared with the trainer by necessity — lexicographic
(cost, n_pieces) minimum, full ties broken toward the earliest
last-piece start — because a different-but-equally-reasonable rule
(e.g. shortest FIRST piece via suffix recursion) picks a different
path on exact cost ties and trains different counts; the code here is
written independently (piece-string backtracking, no back-pointer
array).

Usage: python tools/gen_unigram_fixture.py   (rewrites the fixture)
"""

from __future__ import annotations

import math
import os
import sys
from functools import lru_cache

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "unigram_hard_em_sf001.sql",
)
N_ROUNDS = 2
TOP_K = 12
MAX_PIECE_LEN = 3


def corpus_word_freqs(sf_dir: str) -> dict[str, int]:
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT w, COUNT(*) FROM (SELECT unnest(string_split(text, ' ')) "
        f"AS w FROM read_parquet('{sf_dir}/documents.parquet')) "
        "WHERE w <> '' GROUP BY w"
    ).fetchall()
    return dict(rows)


def _u6(x: float) -> int:
    """Half-up micro-unit rounding — the F.round / SQL ROUND rule."""
    return int(math.floor(x * 1e6 + 0.5))


def init_vocab(wf: dict[str, int]) -> dict[str, int]:
    """Char cover + top-K 2..MAX_PIECE_LEN substrings by occurrence-
    weighted count (ties piece-ascending); counts, not costs."""
    counts: dict[str, int] = {}
    for w, freq in wf.items():
        for ln in range(1, MAX_PIECE_LEN + 1):
            for s in range(len(w) - ln + 1):
                p = w[s:s + ln]
                counts[p] = counts.get(p, 0) + freq
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[:TOP_K]
    return {**chars, **dict(multi)}


def reference_hard_em(sf_dir: str) -> list[tuple[str, int, int]]:
    wf = corpus_word_freqs(sf_dir)
    vocab_counts = init_vocab(wf)
    total0 = sum(vocab_counts.values())
    costs = {p: _u6(math.log(total0 / c)) for p, c in vocab_counts.items()}
    smoothed = vocab_counts
    for _ in range(N_ROUNDS):
        cur = dict(costs)

        @lru_cache(maxsize=None)
        def best(w: str) -> tuple[str, ...] | None:
            """Forward DP carrying the chosen PIECE STRING per cell
            (no back-pointer array): state per position is the
            (cost, n_pieces, last_piece) triple; candidates scan i
            ascending and replace only on strictly-smaller
            (cost, n_pieces), so full ties keep the earliest
            last-piece start — the shared contract."""
            inf = (float("inf"), 0, "")
            dp: list[tuple[float, int, str]] = [inf] * (len(w) + 1)
            dp[0] = (0, 0, "")
            for j in range(1, len(w) + 1):
                for i in range(max(0, j - MAX_PIECE_LEN), j):
                    c = cur.get(w[i:j])
                    if c is None or dp[i][0] == float("inf"):
                        continue
                    cand = (dp[i][0] + c, dp[i][1] + 1, w[i:j])
                    if cand[:2] < dp[j][:2]:
                        dp[j] = cand
            if dp[-1][0] == float("inf"):
                return None
            out, j = [], len(w)
            while j > 0:
                p = dp[j][2]
                out.append(p)
                j -= len(p)
            return tuple(reversed(out))

        counts: dict[str, int] = {}
        for w, freq in wf.items():
            b = best(w)
            if b is None:
                continue
            for p in b:
                counts[p] = counts.get(p, 0) + freq
        best.cache_clear()
        smoothed = {
            p: counts.get(p, 0) + 1
            for p in cur
            if len(p) == 1 or counts.get(p, 0) > 0
        }
        total = sum(smoothed.values())
        costs = {p: _u6(math.log(total / c)) for p, c in smoothed.items()}
    return sorted((p, smoothed[p], costs[p]) for p in costs)


def rows_to_sql(rows: list[tuple[str, int, int]]) -> str:
    vals = ",\n  ".join(
        f"('{p}', {c}, {u})" for p, c, u in rows
    )
    return (
        "SELECT piece, cnt, cost_u6 FROM (VALUES\n  "
        + vals
        + "\n) AS t(piece, cnt, cost_u6)"
    )


def main() -> None:
    sql = rows_to_sql(reference_hard_em(SF_DIR))
    with open(FIXTURE, "w") as f:
        f.write(sql + "\n")
    print(f"wrote {FIXTURE}")


if __name__ == "__main__":
    main()
