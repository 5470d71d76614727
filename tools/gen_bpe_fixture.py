#!/usr/bin/env python
"""Regenerate the literal-expected BPE merge-table fixture (round-6
verdict directive #7 — the multimodal-codec pattern: ground truth
REGENERATED from an independent implementation, not copied from the
system under test).

``reference_bpe`` is a from-scratch pure-Python Sennrich algorithm 1
(dict-of-symbol-tuples representation — deliberately NOT the Spark
trainer's prefix-separator regex representation, so the two
implementations share no machinery): per round, count adjacent symbol
pairs weighted by word frequency, pick the top pair under the exact
contract tie-break (count DESC, then (left, right) binary ascending),
merge it greedily left-to-right non-overlapping in every word.

``main`` builds the word-frequency table from the sf0.01 documents
corpus under the SAME vocabulary gate the registered queries use
(split on single spaces, length >= 2, ^[A-Za-z0-9]+$), trains to
k=200 — past this corpus's saturation point, so the fixture pins the
FULL merge sequence down to the last tie-broken singleton — and
writes the oracle as a literal VALUES table to
``fixtures/bpe_merges_k200_sf001.sql``.

Usage: python tools/gen_bpe_fixture.py   (rewrites the fixture)
The freshness test (tests/test_queries_oracle.py) re-runs
``reference_bpe`` and fails if the committed fixture drifts.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "bpe_merges_k200_sf001.sql",
)
K = 200
_WORD_RE = re.compile(r"^[A-Za-z0-9]+$")


def corpus_word_freqs(sf_dir: str) -> dict[str, int]:
    """The queries' vocabulary gate, re-expressed standalone."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT w, COUNT(*) FROM (
              SELECT unnest(string_split(text, ' ')) AS w
              FROM read_parquet('{sf_dir}/documents.parquet'))
            GROUP BY w"""
    ).fetchall()
    con.close()
    return {
        w: int(n) for w, n in rows if len(w) >= 2 and _WORD_RE.match(w)
    }


def corpus_word_freqs_with_bigrams(sf_dir: str) -> dict[str, int]:
    """The k=1000 row's ENLARGED vocabulary: corpus words PLUS
    adjacent-word concatenations (compound words), under the same
    alphanumeric gate — the corpus's 30 gated words saturate BPE at
    89 merges, while words ∪ bigrams (946 entries) exhausts at 1023,
    so k=1000 trains a full realistic-depth merge sequence from the
    same parquet inputs with no hand-planted data."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""WITH toks AS (
              SELECT string_split(text, ' ') AS ws
              FROM read_parquet('{sf_dir}/documents.parquet')),
            all_w AS (
              SELECT unnest(ws) AS w FROM toks
              UNION ALL
              SELECT ws[i] || ws[i + 1] AS w
              FROM toks, LATERAL unnest(range(1, len(ws))) t(i))
            SELECT w, COUNT(*) FROM all_w GROUP BY w"""
    ).fetchall()
    con.close()
    return {
        w: int(n) for w, n in rows if len(w) >= 2 and _WORD_RE.match(w)
    }


def reference_bpe(
    word_freqs: dict[str, int], k: int
) -> list[tuple[int, str, str, str, int]]:
    """Sennrich et al. 2016 algorithm 1, independently implemented.
    Returns [(merge_rank, left_sym, right_sym, merged, pair_count)];
    stops early when no adjacent pair remains."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs.items():
        key = tuple(w)
        vocab[key] = vocab.get(key, 0) + f
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, k + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, a + b, cnt))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2  # greedy, non-overlapping, continue after
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def merges_to_sql(
    merges: list[tuple[int, str, str, str, int]], k: int = K
) -> str:
    def esc(s: str) -> str:
        return s.replace("'", "''")

    values = ",\n  ".join(
        f"({r}, '{esc(a)}', '{esc(b)}', '{esc(m)}', {c})"
        for r, a, b, m, c in merges
    )
    return (
        "-- GENERATED by tools/gen_bpe_fixture.py from "
        f"{SF_DIR}/documents.parquet at k={k}; do not hand-edit\n"
        "SELECT CAST(merge_rank AS INTEGER) AS merge_rank, left_sym, "
        "right_sym, merged,\n       CAST(pair_count AS BIGINT) AS "
        "pair_count\nFROM (VALUES\n  "
        + values
        + "\n) AS t(merge_rank, left_sym, right_sym, merged, pair_count)"
    )


K1000 = 1000
FIXTURE_K1000 = os.path.join(
    os.path.dirname(FIXTURE), "bpe_merges_k1000_sf001.sql"
)
K10000 = 10000
FIXTURE_K10000 = os.path.join(
    os.path.dirname(FIXTURE), "bpe_merges_k10000_sf001.sql"
)


def corpus_word_freqs_with_trigrams(sf_dir: str) -> dict[str, int]:
    """The k=10000 row's PRODUCTION-SCALE vocabulary: corpus words
    plus adjacent bi- AND tri-gram concatenations under the same
    alphanumeric gate — 17 191 word types from the same parquet
    inputs with no hand-planted data (the bigram vocabulary exhausts
    at 1023 merges; this one trains past 10k)."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""WITH toks AS (
              SELECT string_split(text, ' ') AS ws
              FROM read_parquet('{sf_dir}/documents.parquet')),
            all_w AS (
              SELECT unnest(ws) AS w FROM toks
              UNION ALL
              SELECT ws[i] || ws[i + 1] AS w
              FROM toks, LATERAL unnest(range(1, len(ws))) t(i)
              UNION ALL
              SELECT ws[i] || ws[i + 1] || ws[i + 2] AS w
              FROM toks, LATERAL unnest(range(1, len(ws) - 1)) t(i))
            SELECT w, COUNT(*) FROM all_w GROUP BY w"""
    ).fetchall()
    con.close()
    return {
        w: int(n) for w, n in rows if len(w) >= 2 and _WORD_RE.match(w)
    }


def main() -> None:
    merges = reference_bpe(corpus_word_freqs(SF_DIR), K)
    sql = merges_to_sql(merges)
    with open(FIXTURE, "w") as f:
        f.write(sql + "\n")
    print(f"wrote {len(merges)} merges to {FIXTURE}")
    merges1k = reference_bpe(
        corpus_word_freqs_with_bigrams(SF_DIR), K1000
    )
    with open(FIXTURE_K1000, "w") as f:
        f.write(merges_to_sql(merges1k, K1000) + "\n")
    print(f"wrote {len(merges1k)} merges to {FIXTURE_K1000}")
    merges10k = reference_bpe(
        corpus_word_freqs_with_trigrams(SF_DIR), K10000
    )
    with open(FIXTURE_K10000, "w") as f:
        f.write(merges_to_sql(merges10k, K10000) + "\n")
    print(f"wrote {len(merges10k)} merges to {FIXTURE_K10000}")


if __name__ == "__main__":
    main()
