#!/usr/bin/env python3
"""Triangulating validator for the frequency-quality and unicode-norm
oracles: pure-python replays (top-k vocabulary + multiplicity counts;
unicodedata NFC — a third independent UAX #15 implementation next to
java.text.Normalizer and DuckDB's utf8proc) compared against BOTH the
DuckDB oracle SQL and the Spark output parquet.

Usage: check_quality_sql.py <sfDir> <dumpDir>   (dumpDir from graft.tools.QDump)
"""
import json
import sys
import unicodedata

import duckdb
import pandas as pd

K = 20          # must match the q_freq_quality surface
GATE_N, GATE_D = 7, 10  # pass = n_common * 10 >= n_tokens * 7


def replay_freq(docs):
    toks = {d: [t for t in (x or "").lower().split() if t] for d, x in docs}
    counts = {}
    for tk in toks.values():
        for t in tk:
            counts[t] = counts.get(t, 0) + 1
    top = set(t for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:K])
    out = {}
    for d, tk in toks.items():
        n_common = sum(1 for t in tk if t in top)
        out[d] = (len(tk), n_common, n_common * 10 >= len(tk) * GATE_N)
    return out


def replay_norm(doc_ids):
    out = {}
    for d in doc_ids:
        raw = "Cafe\u0301 menu %d A\u030angstrom" % d
        norm = unicodedata.normalize("NFC", raw)
        out[d] = (norm, len(raw), len(norm))
    return out


def main():
    sf, dump = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    py_freq = replay_freq(docs)
    py_norm = replay_norm([d for d, _ in docs])

    oracle = json.load(open(f"{dump}/oracle_sql.json"))
    sql_freq = {r[0]: (r[1], r[2], r[3])
                for r in con.execute(oracle["q_freq_quality"]).fetchall()}
    sql_norm = {r[0]: (r[1], r[2], r[3])
                for r in con.execute(oracle["q_unicode_norm"]).fetchall()}

    sf_df = pd.read_parquet(f"{dump}/q_freq_quality")
    spark_freq = {r[0]: (r[1], r[2], r[3]) for r in
                  sf_df[["doc_id", "n_tokens", "n_common", "pass"]].itertuples(index=False)}
    sn_df = pd.read_parquet(f"{dump}/q_unicode_norm")
    spark_norm = {r[0]: (r[1], r[2], r[3]) for r in
                  sn_df[["doc_id", "norm", "n_before", "n_after"]].itertuples(index=False)}

    ok = py_freq == sql_freq == spark_freq and py_norm == sql_norm == spark_norm
    n_pass = sum(1 for v in py_freq.values() if v[2])
    print(
        f"QUALITY_CHECK sf={sf} freq docs={len(py_freq)} pass={n_pass} "
        f"norm docs={len(py_norm)} equal={ok}"
    )
    if not ok:
        for name, a, b in [("freq sql", py_freq, sql_freq),
                           ("freq spark", py_freq, spark_freq),
                           ("norm sql", py_norm, sql_norm),
                           ("norm spark", py_norm, spark_norm)]:
            bad = [d for d in a if a[d] != b.get(d)]
            if bad:
                d = sorted(bad)[0]
                print(name, "diff ids", sorted(bad)[:3])
                print(" py :", repr(a[d])[:160])
                print(" oth:", repr(b.get(d))[:160])
        sys.exit(1)


if __name__ == "__main__":
    main()
