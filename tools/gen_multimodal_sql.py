#!/usr/bin/env python3
"""Generate + validate the DuckDB oracle SQL for q_multimodal.

Replays graft.ops.Multimodal syntheticMedia -> extractFeatures per row:
  - kind from doc_id % 3; payload tail = UTF-8 bytes of text.take(512)
    (BMP corpus: chars == codepoints, same assumption as q_fingerprint),
  - image rows carry a real PNG(24)/GIF(10)/JPEG(21) header chosen by
    (id/3) % 3 with width 16 + id%640, height 16 + (id/7)%480 — the
    oracle recomputes the geometry the Spark side recovers by actually
    parsing the header bytes it generated (a round-trip equality proof),
  - audio/video rows replay the FNV-1a-64 payload hash over the raw
    UTF-8 bytes (hex(encode(...)) byte fold in hugeint mod-2^64) and the
    signed abs/shift arithmetic of the stub geometry,
  - empty payloads (empty text on audio/video rows) decode_ok = false.

Usage: python3 tools/gen_multimodal_sql.py [--check sfdir [spark_parquet]] [--emit]
"""
import sys

T = "18446744073709551616::HUGEINT"  # 2^64
H63 = "9223372036854775808::HUGEINT"  # 2^63
FNV_OFFSET = 14695981039346656037
FNV_PRIME = 1099511628211
LIMIT_N = 2000


def oracle_sql(table="documents"):
    fnv = (f"list_reduce(list_prepend({FNV_OFFSET}::HUGEINT,"
           f" list_transform(range(1, octet_length(tail) + 1),"
           f" bi -> ('0x' || substr(hx, 2*bi - 1, 2))::INT::HUGEINT)),"
           f" (h, c) -> xor(h, c) * {FNV_PRIME}::HUGEINT % {T})")
    return f"""WITH media AS (
  SELECT doc_id AS media_id, doc_id AS id,
    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
    encode(left(coalesce(text, ''), 512)) AS tail
  FROM (SELECT doc_id, text FROM {table} LIMIT {LIMIT_N})),
hashed AS (
  SELECT media_id, id, kind, octet_length(tail) AS tlen,
    CASE WHEN kind <> 'image' AND octet_length(tail) > 0 THEN {fnv} ELSE 0::HUGEINT END AS u
  FROM (SELECT *, hex(tail) AS hx FROM media)),
sh AS (
  SELECT *,
    u // 1024::HUGEINT - CASE WHEN u >= {H63} THEN 18014398509481984::HUGEINT
      ELSE 0::HUGEINT END AS s10,
    u // 1048576::HUGEINT - CASE WHEN u >= {H63} THEN 17592186044416::HUGEINT
      ELSE 0::HUGEINT END AS s20,
    CASE WHEN u >= {H63} THEN u - {T} ELSE u END AS s0
  FROM hashed)
SELECT media_id, kind,
  CASE WHEN kind = 'image' THEN
    tlen + (CASE (id // 3) % 3 WHEN 0 THEN 24 WHEN 1 THEN 10 ELSE 21 END)
  ELSE tlen END::BIGINT AS n_bytes,
  (kind = 'image' OR tlen > 0) AS decode_ok,
  CASE WHEN kind = 'image' THEN
    CASE (id // 3) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'jpeg' END
  ELSE '' END AS format,
  CASE WHEN kind = 'image' THEN 16 + id % 640
    WHEN tlen = 0 THEN 0
    ELSE 64 + CAST(abs(s0) % 1024::HUGEINT AS BIGINT) END::INT AS width,
  CASE WHEN kind = 'image' THEN 16 + (id // 7) % 480
    WHEN tlen = 0 THEN 0
    ELSE 64 + CAST(abs(s10) % 1024::HUGEINT AS BIGINT) END::INT AS height,
  CASE WHEN kind = 'image' THEN 1
    WHEN tlen = 0 THEN 0
    WHEN kind = 'video' THEN 1 + CAST(abs(s20) % 64::HUGEINT AS BIGINT)
    ELSE 1 END::INT AS n_frames
FROM sh ORDER BY media_id"""


# ---- pure-python replay of the Scala implementation (validation) ----
MASK = (1 << 64) - 1


def fnv_bytes(bs):
    h = FNV_OFFSET
    for b in bs:
        h = ((h ^ b) * FNV_PRIME) & MASK
    return h


def signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


def mm_py(docs):
    out = []
    for doc_id, text in sorted(docs)[:LIMIT_N]:
        kind = ['image', 'audio', 'video'][doc_id % 3]
        tail = (text or '')[:512].encode('utf-8')
        if kind == 'image':
            hdr = [24, 10, 21][(doc_id // 3) % 3]
            fmt = ['png', 'gif', 'jpeg'][(doc_id // 3) % 3]
            w = 16 + doc_id % 640
            h = 16 + (doc_id // 7) % 480
            out.append((doc_id, kind, hdr + len(tail), True, fmt, w, h, 1))
        elif len(tail) == 0:
            out.append((doc_id, kind, 0, False, '', 0, 0, 0))
        else:
            u = fnv_bytes(tail)
            s = signed(u)
            w = 64 + abs(s) % 1024
            hh = 64 + abs(s >> 10) % 1024
            fr = 1 + abs(s >> 20) % 64 if kind == 'video' else 1
            out.append((doc_id, kind, len(tail), True, '', w, hh, fr))
    return out


def check(sfdir, spark_parquet=None):
    import duckdb
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sfdir}/documents.parquet'")
    got = [tuple(r) for r in con.sql(oracle_sql()).fetchall()]
    docs = con.sql("SELECT doc_id, text FROM documents").fetchall()
    want = mm_py(docs)
    ok = got == want
    print(f"{sfdir}: duckdb={len(got)} python={len(want)} match={ok}")
    if spark_parquet:
        import pandas as pd
        sp = pd.read_parquet(spark_parquet).sort_values('media_id')
        sp_rows = [tuple(r) for r in sp.itertuples(index=False)]
        ok2 = sp_rows == got
        print(f"  vs spark parquet ({len(sp_rows)} rows): match={ok2}")
        ok = ok and ok2
    if not ok:
        print(" duckdb:", got[:4])
        print(" python:", want[:4])
        sys.exit(1)


if __name__ == "__main__":
    if "--emit" in sys.argv:
        print(oracle_sql())
    for i, a in enumerate(sys.argv):
        if a == "--check":
            extra = sys.argv[i + 2] if len(sys.argv) > i + 2 and not sys.argv[i + 2].startswith('--') else None
            check(sys.argv[i + 1], extra)
