#!/usr/bin/env python3
"""Generate + validate the DuckDB oracle SQL for q_ann_lsh.

Replays graft.ops.Similarity.lshNearNeighbors (nBits=12, nTables=16,
seed=42, minCosine=0.35, bucketCap=4096) exactly:
  - 192 hyperplanes x 64 dims from the splitmix64 stream (seeded 42),
    each draw mapped to [-1, 1) by ((u >>> 11) * 2^-53) * 2 - 1,
  - per (vector, table) 12-bit sign signature (left-to-right fold dot
    product, same IEEE double op order as the Scala loop),
  - candidate pairs = same (table, bucket), id_a < id_b,
  - exact cosine verification (same fold order), round 6, >= minCosine,
  - distinct across tables.

The bucket-size cap (4096) cannot trigger on this corpus (500 vectors
total < cap), so the salt column is constant 0 and is elided; check()
asserts that no bucket exceeds the cap so the elision is provably inert.

All integer work is mod-2^64 hugeint (xor and // are native; the two
mix64 multiplies are 32-bit-limb decomposed). The floating-point side
relies only on IEEE-754 ops applied in the identical order, so the
doubles are bit-identical, not merely close.

Usage: python3 tools/gen_lsh_sql.py [--check sfdir [spark_parquet]] [--emit]
"""
import sys

T = "18446744073709551616::HUGEINT"  # 2^64
ADD_C = 0x9E3779B97F4A7C15
M1 = 0xBF58476D1CE4E5B9
M2 = 0x94D049BB133111EB
SEED = 42
N_BITS = 12
N_TABLES = 16
DIM = 64
MIN_COS = "0.35"
BUCKET_CAP = 4096
TWO_NEG53 = "1.1102230246251565e-16"


def mulmod(x, m):
    mh, ml = m >> 32, m & 0xFFFFFFFF
    return (f"(({x}) * {ml}::HUGEINT % {T} + "
            f"(({x}) * {mh}::HUGEINT % 4294967296::HUGEINT) * 4294967296::HUGEINT) % {T}")


def mix64_lateral(x, out):
    """splitmix64 finalizer (incl. the golden-ratio add) as chained LATERALs."""
    return (f"LATERAL (SELECT (({x}) + {ADD_C}::HUGEINT) % {T} AS z1) l1,\n"
            f"       LATERAL (SELECT xor(z1, z1 // 1073741824::HUGEINT) AS x1) l2,\n"
            f"       LATERAL (SELECT {mulmod('x1', M1)} AS z2) l3,\n"
            f"       LATERAL (SELECT xor(z2, z2 // 134217728::HUGEINT) AS x2) l4,\n"
            f"       LATERAL (SELECT {mulmod('x2', M2)} AS z3) l5,\n"
            f"       LATERAL (SELECT xor(z3, z3 // 2147483648::HUGEINT) AS {out}) l6")


def oracle_sql(table="embeddings"):
    n_draws = N_TABLES * N_BITS * DIM
    # draw i (1-based) = finalize(seed + i*ADD_C); mix64_lateral adds ADD_C
    # itself, so feed it seed + (i-1)*ADD_C.
    draw_x = f"({SEED}::HUGEINT + (i - 1)::HUGEINT * {ADD_C}::HUGEINT) % {T}"
    fold_dot = ("list_reduce(list_prepend(0.0::DOUBLE, "
                "list_transform(range(1, %d), ii -> {a}[ii] * {b}[ii])), "
                "(acc, x) -> acc + x)" % (DIM + 1))
    dot_pv = fold_dot.format(a="plane", b="v")
    dot_ab = fold_dot.format(a="sa.v", b="sb.v")
    dot_aa = fold_dot.format(a="sa.v", b="sa.v")
    dot_bb = fold_dot.format(a="sb.v", b="sb.v")
    return f"""WITH draws AS (
  SELECT i, (i - 1) // {DIM} AS p, (i - 1) % {DIM} AS d,
    CAST(h // 2048::HUGEINT AS DOUBLE) * {TWO_NEG53} * 2.0 - 1.0 AS comp
  FROM (SELECT unnest(range(1, {n_draws + 1})) AS i) r,
       {mix64_lateral(draw_x, 'h')}),
planes AS (
  SELECT p, p // {N_BITS} AS tbl, p % {N_BITS} AS bit, list(comp ORDER BY d) AS plane
  FROM draws GROUP BY p),
vecs AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}),
sigs AS MATERIALIZED (
  SELECT vec_id, tbl,
    CAST(sum(CASE WHEN {dot_pv} >= 0 THEN (1 << bit) ELSE 0 END) AS INT) AS bucket
  FROM vecs, planes GROUP BY vec_id, tbl),
cands AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sigs a JOIN sigs b ON a.tbl = b.tbl AND a.bucket = b.bucket
    AND a.vec_id < b.vec_id),
verified AS (
  SELECT c.id_a, c.id_b,
    round(CASE WHEN sqrt({dot_aa}) = 0 OR sqrt({dot_bb}) = 0 THEN 0.0
      ELSE {dot_ab} / (sqrt({dot_aa}) * sqrt({dot_bb})) END, 6) AS cos
  FROM cands c
  JOIN vecs sa ON sa.vec_id = c.id_a
  JOIN vecs sb ON sb.vec_id = c.id_b)
SELECT id_a, id_b, cos FROM verified WHERE cos >= {MIN_COS} ORDER BY 1, 2"""


def cluster_sql(table="embeddings"):
    """q_dedup_cosine_cluster: recursive-CTE closure over the same verified
    LSH pair set (the cluster step of embedding-cosine near-dedup);
    cluster_id = min vec_id per component, matching the Spark operator's
    min-label propagation fixpoint."""
    base = oracle_sql(table)
    head, _tail = base.rsplit("\nSELECT id_a, id_b, cos FROM verified", 1)
    return f"""{head.replace("WITH draws", "WITH RECURSIVE draws", 1)},
lsh_pairs AS MATERIALIZED (
  SELECT id_a, id_b, cos FROM verified WHERE cos >= {MIN_COS}),
nodes AS MATERIALIZED (
  SELECT DISTINCT id FROM (
    SELECT id_a AS id FROM lsh_pairs UNION ALL SELECT id_b FROM lsh_pairs)),
cedges AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM lsh_pairs
  UNION ALL SELECT id_b, id_a FROM lsh_pairs),
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


# ---- pure-python replay of the Scala implementation (validation) ----
MASK = (1 << 64) - 1


def splitmix_stream(seed, n):
    s = seed
    out = []
    for _ in range(n):
        s = (s + ADD_C) & MASK
        z = s
        z = ((z ^ (z >> 30)) * M1) & MASK
        z = ((z ^ (z >> 27)) * M2) & MASK
        z = z ^ (z >> 31)
        out.append(z)
    return out


def planes_py():
    draws = splitmix_stream(SEED, N_TABLES * N_BITS * DIM)
    return [[((u >> 11) * float.fromhex('0x1.0p-53')) * 2.0 - 1.0
             for u in draws[p * DIM:(p + 1) * DIM]]
            for p in range(N_TABLES * N_BITS)]


def lsh_pairs_py(vecs):
    planes = planes_py()
    sigs = {}
    for vid, v in vecs:
        for t in range(N_TABLES):
            sig = 0
            for b in range(N_BITS):
                p = planes[t * N_BITS + b]
                dot = 0.0
                for i in range(min(len(p), len(v))):
                    dot += p[i] * v[i]
                if dot >= 0:
                    sig |= 1 << b
            sigs.setdefault((t, sig), []).append(vid)
    for ids in sigs.values():
        assert len(ids) <= BUCKET_CAP, "bucket cap would trigger; salt elision invalid"
    pairs = set()
    for ids in sigs.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    vd = dict(vecs)

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    out = []
    import math
    for a, b in sorted(pairs):
        va, vb = vd[a], vd[b]
        na, nb = math.sqrt(fold_dot(va, va)), math.sqrt(fold_dot(vb, vb))
        cos = 0.0 if na == 0 or nb == 0 else fold_dot(va, vb) / (na * nb)
        # Spark round(_, 6): BigDecimal HALF_UP on the double's shortest repr
        from decimal import Decimal, ROUND_HALF_UP
        cosr = float(Decimal(repr(cos)).quantize(Decimal('0.000001'), ROUND_HALF_UP))
        if cosr >= float(MIN_COS):
            out.append((a, b, cosr))
    return out


def check(sfdir, spark_parquet=None):
    import duckdb
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sfdir}/embeddings.parquet'")
    got = con.sql(oracle_sql()).fetchall()
    vecs = [(r[0], [float(x) for x in r[1]])
            for r in con.sql("SELECT vec_id, embedding FROM embeddings").fetchall()]
    want = lsh_pairs_py(vecs)
    ok = [(a, b, float(c)) for a, b, c in got] == [(a, b, float(c)) for a, b, c in want]
    print(f"{sfdir}: duckdb={len(got)} python={len(want)} match={ok}")
    if spark_parquet:
        import pandas as pd
        sp = pd.read_parquet(spark_parquet).sort_values(['id_a', 'id_b'])
        sp_rows = [(int(r.id_a), int(r.id_b), float(r.cos)) for r in sp.itertuples()]
        ok2 = sp_rows == [(a, b, float(c)) for a, b, c in got]
        print(f"  vs spark parquet ({len(sp_rows)} rows): match={ok2}")
        ok = ok and ok2
    if not ok:
        print(" duckdb:", got[:5])
        print(" python:", want[:5])
        sys.exit(1)
    cgot = [(a, b) for a, b in con.sql(cluster_sql()).fetchall()]
    cwant = clusters_py([(a, b, float(c)) for a, b, c in want])
    cok = cgot == cwant
    print(f"{sfdir}: cluster duckdb={len(cgot)} python={len(cwant)} match={cok}")
    if not cok:
        print(" duckdb:", cgot[:5])
        print(" python:", cwant[:5])
        sys.exit(1)


if __name__ == "__main__":
    if "--emit" in sys.argv:
        print(oracle_sql())
    for i, a in enumerate(sys.argv):
        if a == "--check":
            extra = sys.argv[i + 2] if len(sys.argv) > i + 2 and not sys.argv[i + 2].startswith('--') else None
            check(sys.argv[i + 1], extra)
