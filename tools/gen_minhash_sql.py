#!/usr/bin/env python3
"""Generate + validate the DuckDB oracle SQL for q_dedup_minhash.

Replays graft.ops.Dedup.minhashPairs (k=64, bands=16, shingleN=3,
threshold=0.5) in exact mod-2^64 arithmetic:
  - word 3-shingles of lowercased whitespace tokens,
  - FNV-1a 64 base hash per shingle (UTF-16 units == codepoints, BMP corpus),
  - 64 slots: min over shingles of mix64(base ^ (i * 0xA24BAED4963EE407)),
    min taken over SIGNED 64-bit values (Scala Long compare),
  - 16 band hashes: FNV-offset^band folded with mix64(h ^ slot) over 4 slots,
  - candidates = pairs sharing any (band, bandhash); est_jaccard =
    matching-slot fraction >= threshold.

DuckDB 1.x HUGEINT has native xor and //, so only the two mix64 multiplies
need 32-bit-limb decomposition (operands ~2^64 would overflow the signed
128-bit product otherwise).

Usage: python3 tools/gen_minhash_sql.py [--check sfdir] [--emit]
"""
import sys

T = "18446744073709551616::HUGEINT"  # 2^64
FNV_OFFSET = 14695981039346656037
FNV_PRIME = 1099511628211
SLOT_C = 0xA24BAED4963EE407
ADD_C = 0x9E3779B97F4A7C15
M1 = 0xBF58476D1CE4E5B9
M2 = 0x94D049BB133111EB


def mulmod(x, m):
    """(x * m) mod 2^64 with m split into 32-bit limbs (hugeint-safe)."""
    mh, ml = m >> 32, m & 0xFFFFFFFF
    return (f"(({x}) * {ml}::HUGEINT % {T} + "
            f"(({x}) * {mh}::HUGEINT % 4294967296::HUGEINT) * 4294967296::HUGEINT) % {T}")


def mix64_lateral(x, out, sfx=""):
    """mix64 as chained LATERAL stages (linear SQL size): each stage names
    its result once, so nothing is substituted repeatedly."""
    z1, x1, z2, x2, z3 = (f"{n}{sfx}" for n in ("z1", "x1", "z2", "x2", "z3"))
    return (f"LATERAL (SELECT (({x}) + {ADD_C}::HUGEINT) % {T} AS {z1}) l1{sfx},\n"
            f"       LATERAL (SELECT xor({z1}, {z1} // 1073741824::HUGEINT) AS {x1}) l2{sfx},\n"
            f"       LATERAL (SELECT {mulmod(x1, M1)} AS {z2}) l3{sfx},\n"
            f"       LATERAL (SELECT xor({z2}, {z2} // 134217728::HUGEINT) AS {x2}) l4{sfx},\n"
            f"       LATERAL (SELECT xor({mulmod(x2, M2)}, ({mulmod(x2, M2)}) // 2147483648::HUGEINT) AS {out}) l5{sfx}")


def mix64_lambda(x):
    """mix64 as a single flat expression (for use inside lambdas where
    scalar subqueries are unavailable)."""
    z1 = f"((({x}) + {ADD_C}::HUGEINT) % {T})"
    x1 = f"xor({z1}, {z1} // 1073741824::HUGEINT)"
    z2 = f"({mulmod(x1, M1)})"
    x2 = f"xor({z2}, {z2} // 134217728::HUGEINT)"
    z3 = f"({mulmod(x2, M2)})"
    return f"xor({z3}, {z3} // 2147483648::HUGEINT)"


def oracle_sql(table="documents", threshold="0.5"):
    fnv_fold = (
        f"list_reduce(list_prepend({FNV_OFFSET}::HUGEINT,"
        f" list_transform(string_split(s, ''), ch -> unicode(ch)::HUGEINT)),"
        f" (h, c) -> xor(h, c) * {FNV_PRIME}::HUGEINT % {T})")
    slot_mix = mix64_lateral(f"xor(b, i * {SLOT_C}::HUGEINT % {T})", "h")
    band_mix = mix64_lambda("xor(h, s)")
    return f"""WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(coalesce(text,'')), '\\s+'), t -> len(t) > 0) AS tk
  FROM {table}),
sh AS (
  SELECT doc_id, CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
    ELSE list_transform(range(1, len(tk) - 1), j -> tk[j] || ' ' || tk[j+1] || ' ' || tk[j+2])
    END AS shs
  FROM toks WHERE len(tk) > 0),
bases AS (
  SELECT doc_id, unnest(list_transform(shs, s -> {fnv_fold})) AS b FROM sh),
slotrows AS (
  SELECT doc_id, i,
    min(CAST(CASE WHEN h >= 9223372036854775808::HUGEINT THEN h - {T}
             ELSE h END AS BIGINT)) AS slot
  FROM (SELECT doc_id, b, unnest(range(0, 64)) AS i FROM bases) e,
       {slot_mix}
  GROUP BY doc_id, i),
sigs AS MATERIALIZED (
  SELECT doc_id, list(slot ORDER BY i) AS sig,
    list(CAST(CASE WHEN slot < 0 THEN slot::HUGEINT + {T}
              ELSE slot::HUGEINT END AS HUGEINT) ORDER BY i) AS usig
  FROM slotrows GROUP BY doc_id),
bands AS (
  SELECT doc_id, unnest(range(0, 16)) AS band FROM sigs),
bhashes AS (
  SELECT b.doc_id, b.band,
    list_reduce(
      list_prepend(xor({FNV_OFFSET}::HUGEINT, b.band::HUGEINT),
        s.usig[b.band * 4 + 1 : b.band * 4 + 4]),
      (h, s) -> {band_mix}) AS bhash
  FROM bands b JOIN sigs s ON b.doc_id = s.doc_id),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bhashes a JOIN bhashes b
    ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id)
SELECT c.id_a, c.id_b,
  CAST(len(list_filter(range(1, 65), j -> sa.sig[j] = sb.sig[j])) AS DOUBLE) / 64 AS est_jaccard
FROM cands c
JOIN sigs sa ON sa.doc_id = c.id_a
JOIN sigs sb ON sb.doc_id = c.id_b
WHERE CAST(len(list_filter(range(1, 65), j -> sa.sig[j] = sb.sig[j])) AS DOUBLE) / 64 >= {threshold}
ORDER BY 1, 2"""


# ---- pure-python replay of the Scala implementation (validation) ----
MASK = (1 << 64) - 1


def mix64_py(x):
    z = (x + ADD_C) & MASK
    z = ((z ^ (z >> 30)) * M1) & MASK
    z = ((z ^ (z >> 27)) * M2) & MASK
    return z ^ (z >> 31)


def hash64_py(s):
    h = FNV_OFFSET
    for ch in s:
        h = ((h ^ ord(ch)) * FNV_PRIME) & MASK
    return h


def shingles_py(text, n=3):
    toks = [t for t in text.lower().split() if t]
    if not toks:
        return []  # content-free doc: NO shingles (doc is dropped)
    if len(toks) < n:
        return [" ".join(toks)]
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


def minhash_pairs_py(docs, k=64, bands=16, threshold=0.5):
    sigs = {}
    for doc_id, text in docs:
        shs = shingles_py(text or "")
        if not shs:
            continue  # content-free doc: dropped before banding
        sig = [signed((1 << 63) - 1)] * k
        for sh in shs:
            base = hash64_py(sh)
            for i in range(k):
                h = signed(mix64_py(base ^ ((i * SLOT_C) & MASK)))
                if h < sig[i]:
                    sig[i] = h
        sigs[doc_id] = sig
    rows_per_band = k // bands
    buckets = {}
    for doc_id, sig in sigs.items():
        for b in range(bands):
            h = FNV_OFFSET ^ b
            for i in range(b * rows_per_band, (b + 1) * rows_per_band):
                h = mix64_py(h ^ (sig[i] & MASK))
            buckets.setdefault((b, h), []).append(doc_id)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    out = []
    for a, b in sorted(pairs):
        est = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y) / 64.0
        if est >= threshold:
            out.append((a, b, est))
    return out


def cluster_sql(table="documents", threshold="0.5"):
    """q_dedup_cluster: recursive-CTE transitive closure over the SAME
    replayed pair set; cluster_id = min id of the component (matches the
    Spark operator's min-label-propagation fixpoint)."""
    base = oracle_sql(table, threshold)
    # rewrap: pairs query -> mh_pairs CTE + closure (mirrors SparkEntry's
    # MinhashCtes refactor)
    head, tail = base.rsplit("SELECT c.id_a, c.id_b,", 1)
    tail = tail.replace("\nORDER BY 1, 2", "")
    head = head.replace("WITH toks AS", "WITH RECURSIVE toks AS", 1)
    head = head.rstrip()
    assert head.endswith(")"), head[-60:]
    mh = head + ",\nmh_pairs AS MATERIALIZED (\n  SELECT c.id_a, c.id_b," + tail.rstrip() + ")"
    # the final select became a CTE: its WHERE keeps the threshold filter
    return mh + """,
nodes AS MATERIALIZED (
  SELECT DISTINCT id FROM (
    SELECT id_a AS id FROM mh_pairs UNION ALL SELECT id_b FROM mh_pairs)),
cedges AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM mh_pairs
  UNION ALL SELECT id_b, id_a FROM mh_pairs),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.b, reach.r FROM cedges e JOIN reach ON reach.id = e.a)
SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
ORDER BY id"""


def clusters_py(pairs):
    """Union-find over the pair list: (id, min id of component)."""
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    ids = set()
    for a, b, _ in pairs:
        ids.add(a)
        ids.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return sorted((i, find(i)) for i in ids)


def keep_best_sql(table="documents", threshold="0.5"):
    """q_dedup_keep_best: kept corpus with the per-cluster argmax(n_chars,
    then min id) survivor — the SAME closure as cluster_sql plus the
    identical window the Spark operator runs (mirrors SparkEntry).
    """
    base = cluster_sql(table, threshold)
    final = "SELECT id, min(r) AS cluster_id FROM reach GROUP BY id\nORDER BY id"
    assert base.endswith(final)
    return base[: -len(final)].rstrip() + f""",
best_l AS (
  SELECT id FROM (
    SELECT lab.id,
      row_number() OVER (PARTITION BY lab.cluster_id
        ORDER BY d.n_chars DESC, lab.id) AS rk
    FROM (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id) lab
    JOIN {table} d ON d.doc_id = lab.id)
  WHERE rk > 1)
SELECT doc_id FROM {table}
WHERE doc_id NOT IN (SELECT id FROM best_l)
ORDER BY doc_id"""


def keep_best_py(pairs, qual, all_ids):
    """Kept ids: everything minus per-cluster non-winners, winner =
    (max quality, then min id) — the python union-find cross-check.
    """
    from collections import defaultdict
    clusters = defaultdict(list)
    for i, c in clusters_py(pairs):
        clusters[c].append(i)
    losers = set()
    for ids in clusters.values():
        win = max(ids, key=lambda i: (qual[i], -i))
        losers.update(i for i in ids if i != win)
    return sorted(i for i in all_ids if i not in losers)


def check(sfdir):
    import duckdb
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sfdir}/documents.parquet'")
    got = con.sql(oracle_sql()).fetchall()
    docs = con.sql("SELECT doc_id, text FROM documents").fetchall()
    want = minhash_pairs_py(docs)
    ok = [(a, b, float(e)) for a, b, e in got] == [(a, b, float(e)) for a, b, e in want]
    print(f"{sfdir}: duckdb={len(got)} python={len(want)} match={ok}")
    if not ok:
        print(" duckdb:", got[:5])
        print(" python:", want[:5])
        sys.exit(1)
    cgot = [(a, b) for a, b in con.sql(cluster_sql()).fetchall()]
    cwant = clusters_py(want)
    cok = cgot == cwant
    print(f"{sfdir}: cluster duckdb={len(cgot)} python={len(cwant)} match={cok}")
    if not cok:
        print(" duckdb:", cgot[:5])
        print(" python:", cwant[:5])
        sys.exit(1)
    meta = con.sql("SELECT doc_id, n_chars FROM documents").fetchall()
    qual = dict(meta)
    bgot = [i for (i,) in con.sql(keep_best_sql()).fetchall()]
    bwant = keep_best_py(want, qual, [i for i, _ in meta])
    bok = bgot == bwant
    print(f"{sfdir}: keep_best duckdb={len(bgot)} python={len(bwant)} match={bok}")
    if not bok:
        print(" duckdb:", bgot[:5])
        print(" python:", bwant[:5])
        sys.exit(1)


if __name__ == "__main__":
    if "--emit" in sys.argv:
        print(oracle_sql())
    for i, a in enumerate(sys.argv):
        if a == "--check":
            check(sys.argv[i + 1])
