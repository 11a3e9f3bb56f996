#!/usr/bin/env python3
"""Staged e10 oracle pin (any SF dir) — the run_d21_sf30_pin.sh precedent.

The monolithic e10 mirror (lshPairCte + recursive components) ENOSPC'd
at sf10: the single-query plan materializes ~64M candidate-pair rows
each carrying two 64-float embeddings through the dot lambda (>70 GB
of DuckDB temp spill), and the reach CTE's transitive closure is
quadratic per component. This staged pin re-derives the SAME protocol
from scratch with bounded footprint:

 1. hyperplane signs recomputed independently (md5 parity — the same
    public definition Similarity.hyperplane documents);
 2. exact integer norms/plane-dots → signature buckets in DuckDB;
 3. the multi-probe candidate join SCORED IN 16 BUCKET CHUNKS, each
    chunk's cos >= eps survivors appended to one pairs table;
 4. connected components via a from-scratch union-find over the pair
    list IN PYTHON (the DedupSimilaritySpec twin-test precedent) —
    independent of Spark's min-label propagation;
 5. cluster sizes, the shared-LM-cost keep-best window and the
    singleton pass-through in SQL (the cost table re-validated
    against DuckDB's own ln within 1 micro-nat, like every LM
    mirror);
 6. exact frame compare against the Spark dump (row set equality on
    all columns).

Prereq: run graft.Verify for e10 at the sf10 dir FIRST (it refreshes
/tmp/graft_shared_oracle/lm_costs for THIS corpus — later gate runs
at other SFs overwrite it) and pass its dump dir.

Usage: pin_e10_staged.py <sf10_dir> <spark_dump_dir>
"""
import duckdb, hashlib, math, sys

sf, dump = sys.argv[1], sys.argv[2]
EPS = 0.42
DIMS = 64
con = duckdb.connect()
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

# planesFor(n, 64): smallest P with expected occupancy <= 64, clamp [1,16]
k = (n + 63) // 64
pl = min(16, max(1, (k - 1).bit_length() if k > 1 else 0 or 1))
if k > 1:
    pl = min(16, max(1, (k - 1).bit_length()))
print(f"n={n} planes={pl}")

# 1. hyperplane signs: parity of first md5 byte of "p{plane}_d{dim}"
rows = []
for p in range(pl):
    for d in range(DIMS):
        h = hashlib.md5(f"p{p}_d{d}".encode()).digest()
        rows.append((p, d + 1, 1.0 if (h[0] & 1) == 0 else -1.0))
con.execute("CREATE TABLE hp(p INT, i INT, sgn DOUBLE)")
con.executemany("INSERT INTO hp VALUES (?,?,?)", rows)

# 2. norms + buckets (exact integer dots, same expressions as the
#    committed e10Sql mirror)
con.execute(f"""
CREATE TABLE e8 AS SELECT vec_id, embedding FROM read_parquet('{emb}')""")
con.execute("""
CREATE TABLE norms AS
SELECT vec_id,
  CAST(list_sum(list_transform(range(1, 65), i ->
    CAST(ROUND(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) * 1e12, 0) AS BIGINT))) AS BIGINT) AS n2
FROM e8""")
con.execute("""
CREATE TABLE buckets AS
WITH hpl AS (SELECT p, list(sgn ORDER BY i) AS sgns FROM hp GROUP BY p),
pdots AS (
 SELECT vec_id, p,
   CAST(list_sum(list_transform(range(1, 65), i ->
     CAST(ROUND(CAST(embedding[i] AS DOUBLE) * sgns[i] * 1e12, 0) AS BIGINT))) AS BIGINT) AS dot
 FROM e8 CROSS JOIN hpl)
SELECT vec_id, CAST(SUM(CASE WHEN dot > 0 THEN (1 << p) ELSE 0 END) AS INTEGER) AS bucket
FROM pdots GROUP BY vec_id""")
con.execute(f"""
CREATE TABLE probes AS
SELECT vec_id AS v1, bucket FROM buckets
UNION ALL
SELECT b.vec_id, xor(b.bucket, CAST(1 << pp.p AS INTEGER))
FROM buckets b CROSS JOIN (SELECT DISTINCT p FROM hp) pp""")

# round-18: the maxBucketOcc hot-bucket cap (Similarity.DefaultMaxBucketOcc
# = 512) — a candidate pair survives iff its JOIN-KEY bucket's own-bucket
# occupancy is <= cap, mirroring the committed e10Sql occ8 filter
CAP = 512
con.execute("CREATE TABLE occ AS SELECT bucket, count(*) AS oc FROM buckets GROUP BY bucket")
print("cap telemetry:", con.execute(f"""
SELECT count(*) AS n_buckets, max(oc) AS max_occ,
  sum(CASE WHEN oc > {CAP} THEN 1 ELSE 0 END) AS buckets_over_cap,
  sum(CASE WHEN oc > {CAP} THEN oc ELSE 0 END) AS rows_in_over_cap
FROM occ""").fetchone(), flush=True)

# 3. chunked candidate scoring: survivors only ever materialize
con.execute("CREATE TABLE pairs(v1 BIGINT, v2 BIGINT)")
CHUNKS = 16
for c in range(CHUNKS):
    con.execute(f"""
    INSERT INTO pairs
    WITH cand AS (
     SELECT pr.v1, b.vec_id AS v2
     FROM probes pr JOIN buckets b
       ON pr.bucket = b.bucket AND pr.v1 < b.vec_id
     JOIN occ ON pr.bucket = occ.bucket AND occ.oc <= {CAP}
     WHERE b.bucket % {CHUNKS} = {c}),
    pd AS (
     SELECT cand.v1, cand.v2,
       CAST(list_sum(list_transform(range(1, 65), i ->
         CAST(ROUND(CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE) * 1e12, 0) AS BIGINT))) AS BIGINT) AS dot_e12
     FROM cand JOIN e8 x ON x.vec_id = cand.v1 JOIN e8 y ON y.vec_id = cand.v2)
    SELECT v1, v2 FROM pd
    JOIN norms na ON v1 = na.vec_id JOIN norms nb ON v2 = nb.vec_id
    WHERE CAST(dot_e12 AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= {EPS}""")
    print(f"chunk {c}: pairs so far",
          con.execute("SELECT count(*) FROM pairs").fetchone()[0], flush=True)

# 4. components via from-scratch union-find in python
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
# min-label convention: the root IS the component minimum because
# unions always point the larger root at the smaller
con.execute("CREATE TABLE cc(v BIGINT, lbl BIGINT)")
con.executemany("INSERT INTO cc VALUES (?,?)", labels)
print("components:", con.execute("SELECT count(DISTINCT lbl) FROM cc").fetchone()[0])

# 5. keep-best + singletons (verbatim from the committed e10Sql tail)
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
          FROM read_parquet('{dump}/e10_semdedup_threshold/*.parquet'))
SELECT
  (SELECT count(*) FROM oracle) AS oracle_rows,
  (SELECT count(*) FROM spark) AS spark_rows,
  (SELECT count(*) FROM (SELECT * FROM oracle EXCEPT SELECT * FROM spark)) AS oracle_minus_spark,
  (SELECT count(*) FROM (SELECT * FROM spark EXCEPT SELECT * FROM oracle)) AS spark_minus_oracle
""").fetchone()
print(f"oracle_rows={res[0]} spark_rows={res[1]} "
      f"oracle\\spark={res[2]} spark\\oracle={res[3]}")
ok = res[0] == res[1] and res[2] == 0 and res[3] == 0
print("PASS e10_semdedup_threshold (staged pin)" if ok else
      "FAIL e10_semdedup_threshold (staged pin)")
sys.exit(0 if ok else 1)
