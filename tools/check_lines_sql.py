#!/usr/bin/env python3
"""Triangulating validator for the line-level oracles: a pure-python
replay of the synthLines page construction, the C4 line rules
(terminal punct / >=3 words / javascript, lorem-ipsum + curly page
kills, terminal-mark sentence proxy), and exact line dedup
(normalize -> Java 31-poly fingerprint mod 2^64 -> keep-first
excision) compared against BOTH the DuckDB oracle SQL
(oracle_sql.json from a Verify/QDump dump) and the Spark parquet.

Usage: check_lines_sql.py <sfDir> <dumpDir>   (dumpDir from graft.tools.QDump)
"""
import json
import sys

import duckdb
import pandas as pd

MASK = (1 << 64) - 1
MIN_SENTENCES = 4  # must match the q_c4_clean surface


def fp64(s: str) -> int:
    h = 1125899906842597
    for c in s:  # BMP corpus: codepoints == UTF-16 units (q_fingerprint contract)
        h = (31 * h + ord(c)) & MASK
    return h - (1 << 64) if h >= (1 << 63) else h


def synth_lines(doc_id: int, text: str) -> str:
    tk = [t for t in (text or "").split() if t]
    lines = [
        "nav menu login",
        " ".join(tk[0:20]) + ".",
        "Please enable JavaScript to view this page.",
        ("Subscribe to our newsletter today!" if doc_id % 3 == 0
         else " ".join(tk[20:40]) + "?"),
        " ".join(tk[40:45]),
        ("lorem ipsum dolor sit amet." if doc_id % 17 == 0
         else f"Closing note number {doc_id}."),
        ("var x = { a: 1 };" if doc_id % 23 == 0
         else f"Contact page {doc_id % 7}!"),
    ]
    return "\n".join(lines)


def c4_metrics(doc_id: int, text: str):
    lines = text.split("\n")
    kept = []
    for l in lines:
        t = l.strip(" \t\r")
        if (t.endswith((".", "!", "?", '"'))
                and len([w for w in t.split() if w]) >= 3
                and "javascript" not in t.lower()):
            kept.append(t)
    clean = "\n".join(kept)
    n_sent = sum(clean.count(c) for c in ".!?")
    page_pass = ("lorem ipsum" not in text.lower() and "{" not in text
                 and n_sent >= MIN_SENTENCES)
    return (doc_id, len(lines), len(kept), n_sent, page_pass, clean)


def line_fps(docs):
    rows = []  # (doc_id, line_no, fp)
    for doc_id, text in docs:
        for i, l in enumerate(text.split("\n")):
            nl = l.strip(" \t\r").lower()
            if nl:
                rows.append((doc_id, i, fp64(nl)))
    return rows


def replay(docs):
    ldocs = [(d, synth_lines(d, t)) for d, t in docs]
    c4 = {r[0]: r for r in (c4_metrics(d, t) for d, t in ldocs)}
    fps = line_fps(ldocs)
    occ = {}
    for _, _, f in fps:
        occ[f] = occ.get(f, 0) + 1
    dups = {(d, i, f, occ[f]) for d, i, f in fps if occ[f] >= 2}
    canon = {}
    for d, i, f in sorted(fps):
        canon.setdefault(f, (d, i))
    covered = {}
    for d, i, f in fps:
        if canon[f] != (d, i):
            covered.setdefault(d, set()).add(i)
    stripped = {}
    for d, t in ldocs:
        if d in covered:
            stripped[d] = "\n".join(
                l for i, l in enumerate(t.split("\n")) if i not in covered[d])
        else:
            stripped[d] = t
    corpus_canon = {}
    for d, i, f in sorted(fps):
        if d % 2 != 0:
            corpus_canon.setdefault(f, (d, i))
    incr = {(d, i, f) + corpus_canon[f]
            for d, i, f in fps if d % 2 == 0 and f in corpus_canon}
    return c4, dups, stripped, incr


def main():
    sf, dump = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    py_c4, py_dups, py_strip, py_incr = replay(docs)

    oracle = json.load(open(f"{dump}/oracle_sql.json"))
    sql_c4 = {r[0]: tuple(r) for r in con.execute(oracle["q_c4_clean"]).fetchall()}
    sql_dups = {tuple(r) for r in con.execute(oracle["q_dedup_lines"]).fetchall()}
    sql_strip = dict(con.execute(oracle["q_line_strip"]).fetchall())
    sql_incr = {tuple(r) for r in con.execute(oracle["q_line_incr"]).fetchall()}

    sc4 = pd.read_parquet(f"{dump}/q_c4_clean")
    spark_c4 = {
        r[0]: tuple(r)
        for r in sc4[["doc_id", "n_lines", "n_kept_lines", "n_sentences",
                      "page_pass", "text_clean"]].itertuples(index=False)
    }
    spark_dups = {
        tuple(r)
        for r in pd.read_parquet(f"{dump}/q_dedup_lines")[
            ["doc_id", "line_no", "fp", "n_occurrences"]
        ].itertuples(index=False)
    }
    sdf = pd.read_parquet(f"{dump}/q_line_strip")
    spark_strip = dict(zip(sdf["doc_id"], sdf["text"]))
    spark_incr = {
        tuple(r)
        for r in pd.read_parquet(f"{dump}/q_line_incr")[
            ["doc_id", "line_no", "fp", "corpus_id", "corpus_line"]
        ].itertuples(index=False)
    }

    ok = (
        py_c4 == sql_c4 == spark_c4
        and py_dups == sql_dups == spark_dups
        and py_strip == sql_strip == spark_strip
        and py_incr == sql_incr == spark_incr
    )
    n_rewritten = sum(1 for d in py_strip
                      if py_strip[d] != synth_lines(d, dict(docs)[d]))
    n_pass = sum(1 for r in py_c4.values() if r[4])
    print(
        f"LINES_CHECK sf={sf} c4 py={len(py_c4)} pass={n_pass} "
        f"dups py={len(py_dups)} sql={len(sql_dups)} spark={len(spark_dups)} "
        f"strip_rewritten={n_rewritten} "
        f"incr py={len(py_incr)} sql={len(sql_incr)} spark={len(spark_incr)} "
        f"equal={ok}"
    )
    if not ok:
        for name, a, b in [("c4 sql", py_c4, sql_c4), ("c4 spark", py_c4, spark_c4)]:
            bad = [d for d in a if a[d] != b.get(d)]
            if bad:
                print(name, "diff ids", sorted(bad)[:3])
                d = sorted(bad)[0]
                print(" py :", repr(a[d])[:200])
                print(" oth:", repr(b.get(d))[:200])
        print("dups only_py", sorted(py_dups - sql_dups)[:3],
              sorted(py_dups - spark_dups)[:3])
        sdiff = [d for d in py_strip if py_strip[d] != sql_strip.get(d)
                 or py_strip[d] != spark_strip.get(d)]
        print("strip diff ids", sorted(sdiff)[:3])
        print("incr only_py", sorted(py_incr - sql_incr)[:3],
              sorted(py_incr - spark_incr)[:3])
        sys.exit(1)


if __name__ == "__main__":
    main()
