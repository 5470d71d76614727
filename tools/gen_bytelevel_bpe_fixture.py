#!/usr/bin/env python
"""Regenerate the byte-level (GPT-2 family) BPE fixtures — the
independent-ground-truth discipline of gen_bpe_fixture.py applied to
the byte-level tokenizer:

- ``scan_pretokens`` is a hand-written SCANNER (state machine, no
  regex) implementing the GPT-2 pre-tokenization contract the engine
  expresses as a Java∩RE2 regex (contractions; optionally
  space-prefixed letter / digit / punctuation runs; whitespace runs —
  the documented no-lookahead deviation applies to both), so the two
  implementations share no machinery;
- ``bytes_to_unicode`` is the public GPT-2 byte→printable-char table
  in its standard formulation;
- the merge sequence comes from gen_bpe_fixture.reference_bpe (the
  from-scratch full-recount Sennrich reference, already independent
  of the Spark trainer), and the apply-side segmentation from a
  rank-order fold reimplemented here.

Corpus: sf0.01 documents.text with the mojibake CLEAN snippet
appended to every document (the engine queries plant the same) — the
snippet's real multi-byte UTF-8 chars exercise the byte table's
non-ASCII rows, which a pure-ASCII corpus never would.

Writes:
- fixtures/bpe_bytelevel_merges_sf001.sql  (learn oracle: literal
  merge table)
- fixtures/bpe_bytelevel_tokens_sf001.sql  (apply oracle: literal
  vocabulary piece counts + per-doc pre-token join SQL)

Usage: python tools/gen_bytelevel_bpe_fixture.py
Freshness tests in tests/test_queries_oracle.py re-run this module's
functions and fail if the committed fixtures drift.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from google_sheets_etl_spark.queries.analytics_q import (  # noqa: E402
    _MOJI_CLEAN,
)
from tools.gen_bpe_fixture import reference_bpe  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
_FIX_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)
FIXTURE_MERGES = os.path.join(_FIX_DIR, "bpe_bytelevel_merges_sf001.sql")
FIXTURE_TOKENS = os.path.join(_FIX_DIR, "bpe_bytelevel_tokens_sf001.sql")
K = 100

_CONTRACTIONS = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")


def scan_pretokens(text: str) -> list[str]:
    """GPT-2 pre-tokenization as an explicit scanner: at each
    position, try a contraction; else classify (after an optional
    single leading space when followed by a non-space) into a letter
    run, digit run, or punctuation run; else consume a whitespace
    run. Mirrors the engine regex's alternation order exactly."""
    out: list[str] = []
    i, n = 0, len(text)

    def is_l(c: str) -> bool:
        return c.isalpha()

    def is_d(c: str) -> bool:
        return c.isdigit()

    while i < n:
        hit = None
        for c in _CONTRACTIONS:
            if text.startswith(c, i):
                hit = c
                break
        if hit is not None:
            out.append(hit)
            i += len(hit)
            continue
        j = i
        if text[j] == " " and j + 1 < n and not text[j + 1].isspace():
            j += 1
        ch = text[j] if j < n else ""
        if ch and is_l(ch):
            k = j
            while k < n and is_l(text[k]):
                k += 1
        elif ch and is_d(ch):
            k = j
            while k < n and is_d(text[k]):
                k += 1
        elif ch and not ch.isspace():
            k = j
            while k < n and not (
                text[k].isspace() or is_l(text[k]) or is_d(text[k])
            ):
                k += 1
        else:  # whitespace run (j == i here: lone/trailing spaces)
            k = i
            while k < n and text[k].isspace():
                k += 1
            out.append(text[i:k])
            i = k
            continue
        out.append(text[i:k])
        i = k
    return out


def bytes_to_unicode() -> dict[int, str]:
    """The public GPT-2 byte→unicode table, standard formulation."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def byte_encode(tok: str) -> str:
    table = bytes_to_unicode()
    return "".join(table[b] for b in tok.encode("utf-8"))


def corpus_texts(sf_dir: str) -> list[str]:
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet') "
        "ORDER BY doc_id"
    ).fetchall()
    con.close()
    texts = [r[0] for r in rows]
    for t in texts:
        # the apply oracle byte-encodes ASCII tokens with a bare
        # space→'Ġ' replace — sound only while the stored corpus is
        # printable ASCII (the moji snippet is handled as literals)
        assert all(0x20 <= ord(c) <= 0x7E for c in t), "non-ASCII corpus"
    return texts


def byte_word_freqs(sf_dir: str) -> dict[str, int]:
    freqs: dict[str, int] = {}
    for text in corpus_texts(sf_dir):
        planted = text + _MOJI_CLEAN
        toks = scan_pretokens(planted)
        # plant-boundary soundness: the snippet starts with a space
        # before a letter, so tokenization distributes over concat
        assert toks == scan_pretokens(text) + scan_pretokens(_MOJI_CLEAN)
        for tok in toks:
            w = byte_encode(tok)
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def apply_merges(
    word: str, merges: list[tuple[int, str, str, str, int]]
) -> list[str]:
    """Rank-order fold of the learned merges over one word — greedy
    left-to-right non-overlapping per merge (the Sennrich apply)."""
    syms = list(word)
    for _, a, b, merged, _ in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _esc(s: str) -> str:
    return s.replace("'", "''")


def merges_sql(merges: list[tuple[int, str, str, str, int]]) -> str:
    values = ",\n  ".join(
        f"({r}, '{_esc(a)}', '{_esc(b)}', '{_esc(m)}', {c})"
        for r, a, b, m, c in merges
    )
    return (
        "-- GENERATED by tools/gen_bytelevel_bpe_fixture.py from "
        f"{SF_DIR}/documents.parquet + moji plant at k={K}; "
        "do not hand-edit\n"
        "SELECT CAST(merge_rank AS INTEGER) AS merge_rank, left_sym, "
        "right_sym, merged,\n       CAST(pair_count AS BIGINT) AS "
        "pair_count\nFROM (VALUES\n  "
        + values
        + "\n) AS t(merge_rank, left_sym, right_sym, merged, pair_count)"
    )


def tokens_sql(
    freqs: dict[str, int],
    merges: list[tuple[int, str, str, str, int]],
) -> str:
    """The per-document apply oracle: literal (word → piece count)
    vocabulary from the independent apply fold, joined to each
    document's pre-tokens. ASCII pre-tokens are byte-encoded in SQL
    by the space→'Ġ' replace (the only ASCII char the table moves);
    the appended moji snippet's tokens — multi-byte, beyond SQL's
    reach — are emitted as a per-doc literal list from the scanner."""
    vt = ",\n  ".join(
        f"('{_esc(w)}', {len(apply_merges(w, merges))})"
        for w in sorted(freqs)
    )
    moji_toks = [byte_encode(t) for t in scan_pretokens(_MOJI_CLEAN)]
    moji = ", ".join(f"'{_esc(t)}'" for t in moji_toks)
    regex = _esc(
        "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
    )
    return (
        "-- GENERATED by tools/gen_bytelevel_bpe_fixture.py from "
        f"{SF_DIR}/documents.parquet + moji plant at k={K}; "
        "do not hand-edit\n"
        "WITH vt(word, n_tok) AS (VALUES\n  " + vt + "),\n"
        "  moji AS (SELECT unnest([" + moji
        + "]) AS word),\n"
        "  ascii_toks AS (\n"
        "    SELECT doc_id,\n"
        f"           unnest(regexp_extract_all(text, '{regex}')) AS tok\n"
        "    FROM documents),\n"
        "  dw AS (\n"
        "    SELECT doc_id, replace(tok, ' ', 'Ġ') AS word"
        " FROM ascii_toks\n"
        "    UNION ALL\n"
        "    SELECT d.doc_id, m.word FROM documents d, moji m)\n"
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pretokens,\n"
        "       CAST(SUM(n_tok) AS BIGINT) AS n_bpe_tokens\n"
        "FROM dw JOIN vt USING (word)\n"
        "GROUP BY doc_id"
    )


def main() -> None:
    freqs = byte_word_freqs(SF_DIR)
    merges = reference_bpe(freqs, K)
    with open(FIXTURE_MERGES, "w") as f:
        f.write(merges_sql(merges) + "\n")
    print(
        f"wrote {len(merges)} merges over {len(freqs)} byte-level "
        f"types to {FIXTURE_MERGES}"
    )
    with open(FIXTURE_TOKENS, "w") as f:
        f.write(tokens_sql(freqs, merges) + "\n")
    print(f"wrote apply oracle to {FIXTURE_TOKENS}")


if __name__ == "__main__":
    main()
