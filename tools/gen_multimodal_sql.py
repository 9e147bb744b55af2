#!/usr/bin/env python3
"""Generate + validate the DuckDB oracle SQL for q_multimodal.

Replays graft.ops.Multimodal syntheticMedia -> extractFeatures per row.
Every synthetic payload now carries a REAL parseable header (PNG/GIF/JPEG
for images, RIFF/WAV for audio, ISO-BMFF/MP4 for video), so the oracle is
a round-trip equality proof: the Spark side PARSES the header bytes it
generated, the oracle recomputes the same values from the generator's
id arithmetic:
  - kind from doc_id % 3; payload tail = UTF-8 bytes of text.take(512)
    (BMP corpus: chars == codepoints, same assumption as q_fingerprint),
  - image: header 24/10/21 bytes by (id/3)%3, width 16 + id%640,
    height 16 + (id/7)%480, n_frames 1,
  - audio (WAV, 44-byte header): channels 1 + id%2, rate 8000*(1+id%6),
    duration_ms = tlen*1000 // (rate*channels*2)  [16-bit PCM byte rate],
  - video (MP4, 240-byte header): width 160 + id%1280,
    height 90 + (id/3)%720, duration_ms = 500 + id%120000 (timescale
    1000), n_frames = max(1, duration_ms*30 // 1000)  [30 fps estimate].

Usage: python3 tools/gen_multimodal_sql.py [--check sfdir [spark_parquet]] [--emit]
"""
import sys

LIMIT_N = 2000


def oracle_sql(table="documents"):
    return f"""WITH media AS (
  SELECT doc_id AS media_id, doc_id AS id,
    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
    octet_length(encode(left(coalesce(text, ''), 512))) AS tlen
  FROM (SELECT doc_id, text FROM {table} LIMIT {LIMIT_N}))
SELECT media_id, kind,
  (tlen + CASE kind WHEN 'audio' THEN 44 WHEN 'video' THEN 240
    ELSE CASE (id // 3) % 3 WHEN 0 THEN 24 WHEN 1 THEN 10 ELSE 21 END
  END)::BIGINT AS n_bytes,
  true AS decode_ok,
  CASE kind WHEN 'audio' THEN 'wav' WHEN 'video' THEN 'mp4'
    ELSE CASE (id // 3) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'jpeg' END
  END AS format,
  (CASE kind WHEN 'image' THEN 16 + id % 640
    WHEN 'video' THEN 160 + id % 1280 ELSE 0 END)::INT AS width,
  (CASE kind WHEN 'image' THEN 16 + (id // 7) % 480
    WHEN 'video' THEN 90 + (id // 3) % 720 ELSE 0 END)::INT AS height,
  (CASE kind WHEN 'image' THEN 1
    WHEN 'video' THEN greatest(1, (500 + id % 120000) * 30 // 1000)
    ELSE 0 END)::INT AS n_frames,
  (CASE kind WHEN 'audio' THEN 1 + id % 2 ELSE 0 END)::INT AS channels,
  (CASE kind WHEN 'audio' THEN 8000 * (1 + id % 6) ELSE 0 END)::INT AS sample_rate,
  (CASE kind WHEN 'audio' THEN
      tlen * 1000 // (8000 * (1 + id % 6) * (1 + id % 2) * 2)
    WHEN 'video' THEN 500 + id % 120000 ELSE 0 END)::BIGINT AS duration_ms
FROM media ORDER BY media_id"""


# ---- pure-python replay of the Scala implementation (validation) ----
def mm_py(docs):
    out = []
    for doc_id, text in sorted(docs)[:LIMIT_N]:
        kind = ['image', 'audio', 'video'][doc_id % 3]
        tail = (text or '')[:512].encode('utf-8')
        tlen = len(tail)
        if kind == 'image':
            hdr = [24, 10, 21][(doc_id // 3) % 3]
            fmt = ['png', 'gif', 'jpeg'][(doc_id // 3) % 3]
            w = 16 + doc_id % 640
            h = 16 + (doc_id // 7) % 480
            out.append((doc_id, kind, hdr + tlen, True, fmt, w, h, 1, 0, 0, 0))
        elif kind == 'audio':
            ch = 1 + doc_id % 2
            rate = 8000 * (1 + doc_id % 6)
            dur = tlen * 1000 // (rate * ch * 2)
            out.append((doc_id, kind, 44 + tlen, True, 'wav', 0, 0, 0, ch, rate, dur))
        else:
            w = 160 + doc_id % 1280
            h = 90 + (doc_id // 3) % 720
            dur = 500 + doc_id % 120000
            fr = max(1, dur * 30 // 1000)
            out.append((doc_id, kind, 240 + tlen, True, 'mp4', w, h, fr, 0, 0, dur))
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
        if not ok2:
            for a, b in zip(sp_rows, got):
                if a != b:
                    print("  spark:", a)
                    print("  duck :", b)
                    break
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
