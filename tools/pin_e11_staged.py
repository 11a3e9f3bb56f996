#!/usr/bin/env python3
"""Staged e11 (banded-OR SemDeDup) oracle pin — the pin_e10_staged.py
precedent applied to the banded generator. The monolithic e11 mirror
is 8x e10's candidate volume (one join per band before the first-match
dedup), which is the ENOSPC class at sf10+; this staging re-derives
the SAME protocol from scratch with bounded footprint:

 1. hyperplane signs for all 8*pl globally-indexed md5 planes
    (band b = planes [b*pl, (b+1)*pl));
 2. per-(vec, band) signature buckets via exact integer plane dots;
 3. per-(band, bucket) occupancy + the maxBucketOcc=512 cap;
 4. candidate pairs with FIRST-MATCH-BAND semantics: min matching
    band per pair (heat-blind, exactly the engine's row-local guard),
    kept iff the bucket shared at that band is under cap;
 5. chunked exact scoring, cos >= eps survivors only;
 6. union-find components in python, keep-best-LM + singletons in
    SQL (cost table re-validated within 1 micro-nat);
 7. exact frame compare against the Spark dump.

Prereq: run graft.Verify for e11 at the same dir FIRST (refreshes
/tmp/graft_shared_oracle/lm_costs for THIS corpus).

Usage: pin_e11_staged.py <sf_dir> <spark_dump_dir>
"""
import hashlib
import sys

import duckdb

sf, dump = sys.argv[1], sys.argv[2]
EPS = 0.42
DIMS = 64
BANDS = 8
CAP = 512
con = duckdb.connect("/tmp/e11pin.duckdb")
con.execute("PRAGMA threads=16")
con.execute("SET memory_limit='40GB'")
con.execute("SET preserve_insertion_order=false")

emb = f"{sf}/embeddings.parquet/*.parquet"
docs = f"{sf}/documents.parquet/*.parquet"
try:
    n = con.execute(f"SELECT count(*) FROM read_parquet('{emb}')").fetchone()[0]
except duckdb.IOException:  # single-file layout (testdata dirs)
    emb = f"{sf}/embeddings.parquet"
    docs = f"{sf}/documents.parquet"
    n = con.execute(f"SELECT count(*) FROM read_parquet('{emb}')").fetchone()[0]

k = (n + 63) // 64
pl = min(16, max(1, (k - 1).bit_length())) if k > 1 else 1
print(f"n={n} planes/band={pl} bands={BANDS}")

rows = []
for p in range(pl * BANDS):
    for d in range(DIMS):
        h = hashlib.md5(f"p{p}_d{d}".encode()).digest()
        rows.append((p, d + 1, 1.0 if (h[0] & 1) == 0 else -1.0))
con.execute("CREATE OR REPLACE TABLE hp(p INT, i INT, sgn DOUBLE)")
con.executemany("INSERT INTO hp VALUES (?,?,?)", rows)

con.execute(f"""
CREATE OR REPLACE TABLE e8 AS
SELECT vec_id, embedding FROM read_parquet('{emb}')""")
con.execute("""
CREATE OR REPLACE TABLE norms AS
SELECT vec_id,
  CAST(list_sum(list_transform(range(1, 65), i ->
    CAST(ROUND(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) * 1e12, 0) AS BIGINT))) AS BIGINT) AS n2
FROM e8""")
# per-band signatures: one pass per band keeps the pdots volume at a
# single-signature footprint each
con.execute("CREATE OR REPLACE TABLE sigb(vec_id BIGINT, band INT, bucket INT)")
for b in range(BANDS):
    con.execute(f"""
    INSERT INTO sigb
    WITH hpl AS (SELECT p, list(sgn ORDER BY i) AS sgns FROM hp
                 WHERE p >= {b * pl} AND p < {(b + 1) * pl} GROUP BY p),
    pdots AS (
     SELECT vec_id, p,
       CAST(list_sum(list_transform(range(1, 65), i ->
         CAST(ROUND(CAST(embedding[i] AS DOUBLE) * sgns[i] * 1e12, 0) AS BIGINT))) AS BIGINT) AS dot
     FROM e8 CROSS JOIN hpl)
    SELECT vec_id, {b},
      CAST(SUM(CASE WHEN dot > 0 THEN (1 << (p - {b * pl})) ELSE 0 END) AS INTEGER)
    FROM pdots GROUP BY vec_id""")
    print(f"band {b} signatures done", flush=True)

con.execute(f"""
CREATE OR REPLACE TABLE occb AS
SELECT band, bucket, count(*) AS oc FROM sigb GROUP BY 1, 2""")
print("cap telemetry:", con.execute(f"""
SELECT count(*), max(oc),
  sum(CASE WHEN oc > {CAP} THEN 1 ELSE 0 END),
  sum(CASE WHEN oc > {CAP} THEN oc ELSE 0 END) FROM occb""").fetchone(),
    flush=True)

# first-match band per pair (heat-blind), then the cap at that band —
# the engine's row-local guard semantics, derived set-wise
con.execute(f"""
CREATE OR REPLACE TABLE candb AS
SELECT a.vec_id AS v1, b.vec_id AS v2, MIN(a.band) AS mb
FROM sigb a JOIN sigb b
  ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
GROUP BY 1, 2""")
print("first-match pairs:",
      con.execute("SELECT count(*) FROM candb").fetchone()[0], flush=True)
con.execute(f"""
CREATE OR REPLACE TABLE capped AS
SELECT c.v1, c.v2
FROM candb c
JOIN sigb s ON s.vec_id = c.v2 AND s.band = c.mb
JOIN occb o ON o.band = c.mb AND o.bucket = s.bucket AND o.oc <= {CAP}""")
print("capped pairs:",
      con.execute("SELECT count(*) FROM capped").fetchone()[0], flush=True)

con.execute("CREATE OR REPLACE TABLE pairs(v1 BIGINT, v2 BIGINT)")
CHUNKS = 16
for c in range(CHUNKS):
    con.execute(f"""
    INSERT INTO pairs
    WITH cand AS (SELECT v1, v2 FROM capped WHERE v2 % {CHUNKS} = {c}),
    pd AS (
     SELECT cand.v1, cand.v2,
       CAST(list_sum(list_transform(range(1, 65), i ->
         CAST(ROUND(CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE) * 1e12, 0) AS BIGINT))) AS BIGINT) AS dot_e12
     FROM cand JOIN e8 x ON x.vec_id = cand.v1 JOIN e8 y ON y.vec_id = cand.v2)
    SELECT v1, v2 FROM pd
    JOIN norms na ON v1 = na.vec_id JOIN norms nb ON v2 = nb.vec_id
    WHERE CAST(dot_e12 AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= {EPS}""")
    print(f"chunk {c}: eps-pairs so far",
          con.execute("SELECT count(*) FROM pairs").fetchone()[0], flush=True)

edges = con.execute("SELECT v1, v2 FROM pairs").fetchall()
parent = {}
def find(x):
    r = x
    while parent.setdefault(r, r) != r:
        r = parent[r]
    while parent[x] != r:
        parent[x], x = r, parent[x]
    return r
for a, b in edges:
    ra, rb = find(a), find(b)
    if ra != rb:
        parent[max(ra, rb)] = min(ra, rb)
labels = [(v, find(v)) for v in list(parent)]
con.execute("CREATE OR REPLACE TABLE cc(v BIGINT, lbl BIGINT)")
con.executemany("INSERT INTO cc VALUES (?,?)", labels)
print("components:",
      con.execute("SELECT count(DISTINCT lbl) FROM cc").fetchone()[0])

shared = "/tmp/graft_shared_oracle/lm_costs/*.parquet"
res = con.execute(f"""
WITH csize AS (SELECT lbl, CAST(count(*) AS BIGINT) AS cluster_size
               FROM cc GROUP BY lbl),
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         FROM read_parquet('{docs}')),
cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cnt),
sharedlm AS (SELECT tok, cnt, nlp_micro FROM read_parquet('{shared}')),
chk AS (SELECT CASE WHEN
    (SELECT count(*) FROM sharedlm) = (SELECT count(*) FROM cnt) AND
    (SELECT count(*) FROM sharedlm n
       JOIN cnt c ON n.tok = c.tok AND n.cnt = c.c
       CROSS JOIN tot
       WHERE abs(n.nlp_micro
                 - CAST(round(ln(CAST(t AS DOUBLE) / CAST(c.c AS DOUBLE))
                              * 1000000) AS BIGINT)) <= 1)
      = (SELECT count(*) FROM cnt)
  THEN 1 ELSE 0 END AS ok),
nlp AS (SELECT tok, nlp_micro FROM sharedlm WHERE (SELECT ok FROM chk) = 1),
score AS (SELECT doc_id, CAST(SUM(nlp_micro) AS DOUBLE) / count(*) AS sc
          FROM toks JOIN nlp USING (tok) GROUP BY doc_id),
best AS (SELECT v AS doc_id, lbl AS cluster_rep, cluster_size,
           'best_in_cluster' AS kept_reason
         FROM (SELECT cc.v, cc.lbl, csize.cluster_size,
                 row_number() OVER (PARTITION BY cc.lbl
                                    ORDER BY score.sc, cc.v) AS rk
               FROM cc JOIN csize USING (lbl)
               JOIN score ON cc.v = score.doc_id)
         WHERE rk = 1),
singles AS (SELECT doc_id, doc_id AS cluster_rep,
              CAST(1 AS BIGINT) AS cluster_size, 'singleton' AS kept_reason
            FROM read_parquet('{docs}')
            WHERE doc_id NOT IN (SELECT v FROM cc)),
oracle AS (SELECT * FROM best UNION ALL SELECT * FROM singles),
spark AS (SELECT doc_id, cluster_rep, cluster_size, kept_reason
          FROM read_parquet('{dump}/e11_semdedup_banded/*.parquet'))
SELECT
  (SELECT count(*) FROM oracle) AS oracle_rows,
  (SELECT count(*) FROM spark) AS spark_rows,
  (SELECT count(*) FROM (SELECT * FROM oracle EXCEPT SELECT * FROM spark)) AS oracle_minus_spark,
  (SELECT count(*) FROM (SELECT * FROM spark EXCEPT SELECT * FROM oracle)) AS spark_minus_oracle
""").fetchone()
print(f"oracle_rows={res[0]} spark_rows={res[1]} "
      f"oracle\\spark={res[2]} spark\\oracle={res[3]}")
ok = res[0] == res[1] and res[2] == 0 and res[3] == 0
print("PASS e11_semdedup_banded (staged pin)" if ok else
      "FAIL e11_semdedup_banded (staged pin)")
sys.exit(0 if ok else 1)
