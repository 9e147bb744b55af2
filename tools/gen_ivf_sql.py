#!/usr/bin/env python3
"""Generate + validate the DuckDB oracle SQL for q_ann_ivf.

Replays graft.ops.Similarity.ivfTopK (k=5, nList=16, nProbe=8,
trainSampleN=4096, iters=8) exactly, including the driver-side Lloyd
k-means:
  - training sample = corpus ORDER BY vec_id LIMIT 4096, L2-normalized,
  - deterministic spread init: centroid c = normalized point at index
    floor(c*N/16),
  - 8 Lloyd iterations UNROLLED as chained CTEs (one assignment +
    re-centering block per iteration): assignment by strict-argmax over
    the 16 centroids (first max wins — a pure-lambda fold carrying
    {i, d}), per-cell means folded in point order then renormalized,
    empty cells keeping their centroid,
  - corpus rows assigned to their nearest cell (raw vectors, like the
    Scala path), queries probing their nProbe nearest cells (dot desc,
    cell asc), candidates joined on the cell id,
  - exact cosine (same fold order), round 6, rank by (cos desc,
    neighbor_id), top k.

Every floating-point step applies IEEE-754 doubles in the identical
order to the Scala loops, so the values are bit-identical, not merely
close.

Usage: python3 tools/gen_ivf_sql.py [--check sfdir [spark_parquet]] [--emit]
"""
import sys

N_LIST = 16
N_PROBE = 8
K = 5
ITERS = 8
TRAIN_N = 4096
DIM = 64


def fold_dot(a, b):
    """Left fold of the element products — the Scala dot-loop order."""
    return ("list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(range(1, {DIM + 1}), fi -> {a}[fi] * {b}[fi])), "
            "(fa, fx) -> fa + fx)")


def argmax_cell(vec, cents):
    """Strict-argmax cell (1-based; first max wins) — pure lambdas."""
    return (f"""(list_reduce(list_prepend({{'i': 0, 'd': '-infinity'::DOUBLE}},
      list_transform(range(1, {N_LIST + 1}), gi -> {{'i': gi, 'd':
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(range(1, {DIM + 1}), fi -> {vec}[fi] * {cents}[gi][fi])),
          (fa, fx) -> fa + fx)}})),
      (acc, e) -> CASE WHEN e.d > acc.d THEN e ELSE acc END)).i""")


def lloyd_step(k):
    """CTEs computing cents{k} from cents{k-1} over pts."""
    am = argmax_cell("pv", "cl")
    return f"""asg{k} AS (
  SELECT rn, pv, {am} AS cell
  FROM pts CROSS JOIN cents{k - 1}),
grp{k} AS (
  SELECT cell, count(*) AS cnt, list(pv ORDER BY rn) AS plist
  FROM asg{k} GROUP BY cell),
cm{k} AS (
  SELECT cell, CASE WHEN nrm > 0 THEN list_transform(m, mx -> mx / nrm) ELSE m END AS nv
  FROM (
    SELECT cell, m, sqrt(list_reduce(list_prepend(0.0::DOUBLE,
      list_transform(range(1, {DIM + 1}), si -> m[si] * m[si])),
      (sa, sx) -> sa + sx)) AS nrm
    FROM (
      SELECT cell, list_transform(range(1, {DIM + 1}), di ->
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(plist, pp -> pp[di])), (ua, ux) -> ua + ux) / cnt) AS m
      FROM grp{k}))),
cents{k} AS (
  SELECT list(coalesce(n.nv, prev.cl[r.nc]) ORDER BY r.nc) AS cl
  FROM range(1, {N_LIST + 1}) r(nc)
  CROSS JOIN cents{k - 1} prev
  LEFT JOIN cm{k} n ON n.cell = r.nc)"""


def oracle_sql(table="embeddings"):
    steps = ",\n".join(lloyd_step(k) for k in range(1, ITERS + 1))
    probe_dots = (f"list_transform(range(1, {N_LIST + 1}), dci -> "
                  + fold_dot("qv", "cl[dci]").replace("fi ->", "pfi ->")
                  .replace("[fi]", "[pfi]") + ")")
    return f"""WITH vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}),
sample AS (
  SELECT vec_id, v FROM vecs ORDER BY vec_id LIMIT {TRAIN_N}),
pts AS (
  SELECT rn, CASE WHEN nrm > 0 THEN list_transform(v, x -> x / nrm) ELSE v END AS pv
  FROM (
    SELECT row_number() OVER (ORDER BY vec_id) AS rn, v,
      sqrt({fold_dot('v', 'v')}) AS nrm
    FROM sample)),
nmax AS (SELECT count(*) AS n FROM pts),
cents0 AS (
  SELECT list(p.pv ORDER BY r.c) AS cl
  FROM range(0, {N_LIST}) r(c), nmax
  JOIN pts p ON p.rn = (r.c * nmax.n) // {N_LIST} + 1),
{steps},
assigned AS (
  SELECT vec_id AS neighbor_id, v AS cvec, {argmax_cell('v', 'cl')} AS cell
  FROM vecs CROSS JOIN cents{ITERS}),
probes AS (
  SELECT query_id, qvec, cell FROM (
    SELECT query_id, qvec, unnest(range(1, {N_LIST + 1})) AS cell, dots
    FROM (
      SELECT q.vec_id AS query_id, q.qv AS qvec, {probe_dots} AS dots
      FROM (SELECT vec_id, v AS qv FROM vecs ORDER BY vec_id LIMIT {N_PROBE}) q
      CROSS JOIN cents{ITERS})) e
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dots[cell] DESC, cell) <= {N_PROBE}),
scored AS (
  SELECT p.query_id, a.neighbor_id,
    round(CASE WHEN sqrt({fold_dot('p.qvec', 'p.qvec')}) = 0
             OR sqrt({fold_dot('a.cvec', 'a.cvec')}) = 0 THEN 0.0
      ELSE {fold_dot('p.qvec', 'a.cvec')} /
        (sqrt({fold_dot('p.qvec', 'p.qvec')}) * sqrt({fold_dot('a.cvec', 'a.cvec')}))
      END, 6) AS cos
  FROM assigned a JOIN probes p ON a.cell = p.cell
  WHERE a.neighbor_id <> p.query_id)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT query_id, neighbor_id, cos,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
WHERE rank <= {K} ORDER BY query_id, rank"""


# ---- pure-python replay of the Scala implementation (validation) ----
import math


def normalized(v):
    d = [float(x) for x in v]
    s = 0.0
    for x in d:
        s += x * x
    n = math.sqrt(s)
    if n > 0:
        d = [x / n for x in d]
    return d


def dot(a, b):
    s = 0.0
    for i in range(min(len(a), len(b))):
        s += a[i] * b[i]
    return s


def nearest_cell(p, cents):
    best, bd = 0, float('-inf')
    for c in range(len(cents)):
        s = dot(p, cents[c])
        if s > bd:
            bd, best = s, c
    return best


def train(sample, n_list, iters):
    pts = [normalized(v) for v in sample]
    dim = len(pts[0])
    cents = [list(pts[(c * len(pts)) // n_list]) for c in range(min(n_list, len(pts)))]
    for _ in range(iters):
        sums = [[0.0] * dim for _ in cents]
        counts = [0] * len(cents)
        for p in pts:
            c = nearest_cell(p, cents)
            counts[c] += 1
            for i in range(dim):
                sums[c][i] += p[i]
        for c in range(len(cents)):
            if counts[c] > 0:
                s = 0.0
                for i in range(dim):
                    sums[c][i] /= counts[c]
                    s += sums[c][i] * sums[c][i]
                n = math.sqrt(s)
                if n > 0:
                    for i in range(dim):
                        sums[c][i] /= n
                cents[c] = sums[c]
    return cents


def nearest_cells(v, cents, n_probe):
    ranked = sorted(((dot(v, c), i) for i, c in enumerate(cents)),
                    key=lambda t: (-t[0], t[1]))
    return [i for _, i in ranked[:n_probe]]


def ivf_py(vecs):
    from decimal import Decimal, ROUND_HALF_UP
    by_id = sorted(vecs)
    sample = [[float(x) for x in v] for _, v in by_id[:TRAIN_N]]
    cents = train(sample, N_LIST, ITERS)
    assigned = [(vid, v, nearest_cells([float(x) for x in v], cents, 1)[0])
                for vid, v in vecs]
    queries = by_id[:N_PROBE]
    out = []
    for qid, qv in queries:
        qd = [float(x) for x in qv]
        probed = set(nearest_cells(qd, cents, N_PROBE))
        nq = math.sqrt(dot(qd, qd))
        cand = []
        for nid, nv, cell in assigned:
            if cell in probed and nid != qid:
                nd = [float(x) for x in nv]
                nn = math.sqrt(dot(nd, nd))
                cos = 0.0 if nq == 0 or nn == 0 else dot(qd, nd) / (nq * nn)
                cosr = float(Decimal(repr(cos)).quantize(Decimal('0.000001'), ROUND_HALF_UP))
                cand.append((cosr, nid))
        cand.sort(key=lambda t: (-t[0], t[1]))
        for r, (c, nid) in enumerate(cand[:K], 1):
            out.append((qid, nid, c, r))
    return out


def check(sfdir, spark_parquet=None):
    import duckdb
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sfdir}/embeddings.parquet'")
    got = con.sql(oracle_sql()).fetchall()
    vecs = [(r[0], [float(x) for x in r[1]])
            for r in con.sql("SELECT vec_id, embedding FROM embeddings").fetchall()]
    want = ivf_py(vecs)
    g = [(a, b, float(c), r) for a, b, c, r in got]
    w = [(a, b, float(c), r) for a, b, c, r in want]
    ok = g == w
    print(f"{sfdir}: duckdb={len(got)} python={len(want)} match={ok}")
    if spark_parquet:
        import pandas as pd
        sp = pd.read_parquet(spark_parquet).sort_values(['query_id', 'rank'])
        sp_rows = [(int(r.query_id), int(r.neighbor_id), float(r.cos), int(r.rank))
                   for r in sp.itertuples()]
        ok2 = sp_rows == g
        print(f"  vs spark parquet ({len(sp_rows)} rows): match={ok2}")
        ok = ok and ok2
    if not ok:
        print(" duckdb:", g[:6])
        print(" python:", w[:6])
        sys.exit(1)


if __name__ == "__main__":
    if "--emit" in sys.argv:
        print(oracle_sql())
    for i, a in enumerate(sys.argv):
        if a == "--check":
            extra = sys.argv[i + 2] if len(sys.argv) > i + 2 and not sys.argv[i + 2].startswith('--') else None
            check(sys.argv[i + 1], extra)
