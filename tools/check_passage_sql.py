#!/usr/bin/env python3
"""Triangulating validator for the passage-dedup oracles: a pure-python
replay of windowed passage fingerprinting (tokenize -> stride-1 w-token
windows -> Java 31-poly fingerprint mod 2^64 -> occurrence counts ->
keep-first apply) compared against BOTH the DuckDB oracle SQL
(oracle_sql.json from a Verify/QDump dump) and the Spark output parquet.

Usage: check_passage_sql.py <sfDir> <dumpDir>   (dumpDir from graft.tools.QDump)
"""
import json
import sys

import duckdb
import pandas as pd

MASK = (1 << 64) - 1
W = 25  # must match the q_dedup_passages / q_passage_apply surfaces


def fp64(s: str) -> int:
    h = 1125899906842597
    for c in s:  # BMP corpus: codepoints == UTF-16 units (q_fingerprint contract)
        h = (31 * h + ord(c)) & MASK
    return h - (1 << 64) if h >= (1 << 63) else h


def replay(docs):
    rows = []  # (doc_id, pos, fp)
    for doc_id, text in docs:
        tk = [t for t in (text or "").lower().split() if t]
        if len(tk) < W:
            continue
        for j in range(len(tk) - W + 1):
            rows.append((doc_id, j, fp64(" ".join(tk[j : j + W]))))
    counts = {}
    for _, _, f in rows:
        counts[f] = counts.get(f, 0) + 1
    hits = {(d, p, f, counts[f]) for d, p, f in rows if counts[f] >= 2}
    # apply: canonical = lexicographic-min (doc_id, pos) per fp
    first = {}
    for d, p, f in sorted(rows):
        first.setdefault(f, (d, p))
    losers = {d for d, p, f in rows if first[f] != (d, p)}
    # strip: union of [pos, pos+W) covered indexes per doc over
    # non-canonical windows; rebuild from the RAW (case-preserving) tokens
    covered = {}
    for d, p, f in rows:
        if first[f] != (d, p):
            covered.setdefault(d, set()).update(range(p, p + W))
    stripped = {}
    for doc_id, text in docs:
        if doc_id in covered:
            raw = [t for t in (text or "").split() if t]
            stripped[doc_id] = " ".join(
                t for i, t in enumerate(raw) if i not in covered[doc_id]
            )
        else:
            stripped[doc_id] = text or ""
    # incremental: even-id (batch) windows whose fp the odd-id (corpus)
    # side holds, matched to the corpus-side canonical occurrence
    canon = {}
    for d, p, f in sorted(rows):
        if d % 2 != 0:
            canon.setdefault(f, (d, p))
    incr = {
        (d, p, f, canon[f][0], canon[f][1])
        for d, p, f in rows
        if d % 2 == 0 and f in canon
    }
    return hits, losers, stripped, incr


def main():
    sf, dump = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    py_hits, py_losers, py_strip, py_incr = replay(docs)
    all_ids = {d for d, _ in docs}
    py_kept = all_ids - py_losers

    oracle = json.load(open(f"{dump}/oracle_sql.json"))
    sql_hits = {
        tuple(r)
        for r in con.execute(oracle["q_dedup_passages"]).fetchall()
    }
    sql_kept = {r[0] for r in con.execute(oracle["q_passage_apply"]).fetchall()}
    sql_strip = dict(con.execute(oracle["q_passage_strip"]).fetchall())
    sql_incr = {tuple(r) for r in con.execute(oracle["q_passage_incr"]).fetchall()}

    spark_hits = {
        tuple(r)
        for r in pd.read_parquet(f"{dump}/q_dedup_passages")[
            ["doc_id", "pos", "fp", "n_occurrences"]
        ].itertuples(index=False)
    }
    spark_kept = set(pd.read_parquet(f"{dump}/q_passage_apply")["doc_id"])
    sdf = pd.read_parquet(f"{dump}/q_passage_strip")
    spark_strip = dict(zip(sdf["doc_id"], sdf["text"]))
    spark_incr = {
        tuple(r)
        for r in pd.read_parquet(f"{dump}/q_passage_incr")[
            ["doc_id", "pos", "fp", "corpus_id", "corpus_pos"]
        ].itertuples(index=False)
    }

    ok = (
        py_hits == sql_hits == spark_hits
        and py_kept == sql_kept == spark_kept
        and py_strip == sql_strip == spark_strip
        and py_incr == sql_incr == spark_incr
    )
    n_rewritten = sum(1 for d, t in docs if py_strip[d] != (t or ""))
    print(
        f"PASSAGE_CHECK sf={sf} hits py={len(py_hits)} sql={len(sql_hits)} "
        f"spark={len(spark_hits)} kept py={len(py_kept)} sql={len(sql_kept)} "
        f"spark={len(spark_kept)} strip_rewritten={n_rewritten} "
        f"incr py={len(py_incr)} sql={len(sql_incr)} spark={len(spark_incr)} "
        f"equal={ok}"
    )
    if not ok:
        print("only_py_hits", sorted(py_hits - sql_hits)[:5])
        print("only_sql_hits", sorted(sql_hits - py_hits)[:5])
        print("kept_diff", sorted(py_kept ^ sql_kept)[:5], sorted(py_kept ^ spark_kept)[:5])
        sdiff = [d for d in py_strip if py_strip[d] != sql_strip.get(d)
                 or py_strip[d] != spark_strip.get(d)]
        print("strip_diff_ids", sorted(sdiff)[:5])
        for d in sorted(sdiff)[:2]:
            print("py  :", repr(py_strip[d])[:120])
            print("sql :", repr(sql_strip.get(d))[:120])
            print("spark:", repr(spark_strip.get(d))[:120])
        sys.exit(1)


if __name__ == "__main__":
    main()
