#!/usr/bin/env python3
"""Prototype: DuckDB replay of annIvf (deterministic k-means, 2 iters,
16 centroids, nProbe 2, k 5) compared against the Spark q40 dump."""
import sys
import duckdb
import pandas as pd

sf_dir, dump = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')")
con.execute("""
CREATE MACRO pdot(v, w) AS list_reduce(list_transform(range(1, 65), i -> CAST(v[i] AS DOUBLE) * w[i]), (a, b) -> a + b);
CREATE MACRO pcos(a, b) AS pdot(a, b) / (sqrt(pdot(a, a)) * sqrt(pdot(b, b)));
""")

ASSIGN = """
SELECT vec_id, cid FROM (
  SELECT e.vec_id, c.cid,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY pcos(e.embedding, c.cvec) DESC NULLS LAST, c.cid) AS rnk
  FROM embeddings e CROSS JOIN {C} c) WHERE rnk = 1
"""
RECOMPUTE = """
SELECT prev.cid, COALESCE(r.nvec, prev.cvec) AS cvec FROM {C} prev LEFT JOIN (
  SELECT cid, list(m ORDER BY pos) AS nvec FROM (
    SELECT a.cid, u.pos, CAST(SUM(CAST(u.x AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS m
    FROM embeddings e JOIN {A} a ON e.vec_id = a.vec_id,
      LATERAL (SELECT unnest(list_transform(e.embedding, f -> CAST(f AS DOUBLE))) AS x,
               generate_subscripts(e.embedding, 1) AS pos) u
    GROUP BY a.cid, u.pos) GROUP BY cid) r ON prev.cid = r.cid
"""

sql = f"""
WITH c0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)
), a1 AS ({ASSIGN.format(C='c0')}),
c1 AS ({RECOMPUTE.format(C='c0', A='a1')}),
a2 AS ({ASSIGN.format(C='c1')}),
c2 AS ({RECOMPUTE.format(C='c1', A='a2')}),
cells AS ({ASSIGN.format(C='c2')}),
probes AS (
  SELECT qid, cid FROM (
    SELECT q.vec_id AS qid, c.cid,
      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY pcos(q.embedding, c.cvec) DESC NULLS LAST, c.cid) AS rnk
    FROM embeddings q CROSS JOIN c2 c WHERE q.vec_id < 10) WHERE rnk <= 2
), cand AS (
  SELECT DISTINCT p.qid, s.vec_id AS nid FROM probes p JOIN cells s ON p.cid = s.cid WHERE s.vec_id <> p.qid
), scored AS (
  SELECT c.qid, c.nid, round(pcos(qe.embedding, ne.embedding), 4) AS cos_r
  FROM cand c JOIN embeddings qe ON qe.vec_id = c.qid JOIN embeddings ne ON ne.vec_id = c.nid
), r AS (
  SELECT qid, nid, cos_r, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_r DESC NULLS LAST, nid) AS rnk FROM scored
)
SELECT qid, rnk, nid, cos_r FROM r WHERE rnk <= 5 ORDER BY qid, rnk
"""
exp = con.execute(sql).fetchdf()
got = pd.read_parquet(dump)
def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)
g, e = canon(got), canon(exp)
if len(g) != len(e):
    print(f"MISMATCH rowcount {len(g)} vs {len(e)}")
else:
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
        print(f"MATCH rows={len(g)}")
    except AssertionError as ex:
        print("MISMATCH", str(ex).split("\n")[-2:])
