#!/usr/bin/env python3
"""Driver-style DuckDB oracle cross-check over a Verify dump.

Usage: python3 tools/check_oracles.py <sfdir> <verify_out_dir> [query ...]

Replays every q_* oracle from <verify_out_dir>/oracle_sql.json in DuckDB
(views over <sfdir>/*.parquet), loads the Spark result parquet from
<verify_out_dir>/<name>/, and compares column names + row count + the
sorted stringified row multiset (the driver's rows/schema/hash check).
Prints one line per query and a final summary; exit code 1 on any mismatch.
"""
import hashlib
import json
import os
import sys

import duckdb


def canon(v):
    if v is None:
        return ""
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def rows_key(cols, rows):
    srows = sorted(tuple(canon(v) for v in r) for r in rows)
    h = hashlib.sha256()
    for r in srows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return len(srows), h.hexdigest(), srows


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "part", "events", "documents",
              "embeddings", "nation", "region", "supplier"):
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    bad = []
    names = sorted(n for n in oracles if not only or n in only)
    for name in names:
        spark_dir = os.path.join(outdir, name)
        if not os.path.isdir(spark_dir):
            print(f"{name:26s} MISSING spark output")
            bad.append(name)
            continue
        try:
            o = con.execute(oracles[name])
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
            s = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            scols = [d[0] for d in s.description]
            srows = s.fetchall()
        except Exception as e:
            print(f"{name:26s} ERROR {e}")
            bad.append(name)
            continue
        on, oh, osr = rows_key(ocols, orows)
        sn, sh, ssr = rows_key(scols, srows)
        ok_schema = ocols == scols
        ok = ok_schema and on == sn and oh == sh
        status = "ok" if ok else "MISMATCH"
        print(f"{name:26s} {status} rows {sn}/{on} schema "
              f"{'=' if ok_schema else f'{scols} vs {ocols}'}")
        if not ok:
            bad.append(name)
            for i, (a, b) in enumerate(zip(ssr, osr)):
                if a != b:
                    print(f"   first diff row {i}: spark={a} oracle={b}")
                    break
    print(f"\n{len(names) - len(bad)}/{len(names)} green"
          + (f"; MISMATCHES: {bad}" if bad else ""))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
