#!/usr/bin/env python3
"""Staged d35 oracle pin at sf30 — third decade above the driver gate.

The monolithic d35 mirror at sf30 would window+self-join ~900M
positional gram rows in one plan (the e10-sf10 ENOSPC class). The
staged form re-derives the identical protocol with bounded footprint:

 1. positional 5-gram md5 table MATERIALIZED once into an on-disk
    DuckDB database (spill-bounded; memory capped);
 2. the occurrence cap as an aggregate into a tiny over-cap key set
    (identical semantics to the mirror's COUNT window: a gram is
    in-universe iff its total occurrences <= 100);
 3. the cross-doc gram self-join in HASH CHUNKS of the gram key —
    both sides filter to the same chunk, so each chunk joins a
    bounded slice and appends its match positions;
 4. the diagonal gaps-and-islands confirmation + >= minTokens filter
    in one pass over the accumulated match table;
 5. exact frame compare against the Spark dump.

Usage: pin_d35_sf30.py <sf_dir> <spark_dump_dir>
"""
import duckdb, os, sys

sf, dump = sys.argv[1], sys.argv[2]
K, MIN, MAXOCC, CHUNKS = 5, 15, 100, 32
dbf = "/tmp/d35pin.duckdb"
if os.path.exists(dbf):
    os.remove(dbf)
con = duckdb.connect(dbf)
con.execute("PRAGMA threads=16")
con.execute("SET memory_limit='40GB'")
con.execute("SET preserve_insertion_order=false")

docs = f"{sf}/documents.parquet/*.parquet"
try:
    con.execute(f"SELECT count(*) FROM read_parquet('{docs}')").fetchone()
except duckdb.IOException:
    docs = f"{sf}/documents.parquet"

con.execute(f"""
CREATE TABLE grams AS
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
              FROM read_parquet('{docs}'))
SELECT doc_id,
  unnest(range(1, greatest(len(t) - {K - 2}, 1))) AS pos,
  unnest(list_transform(range(1, greatest(len(t) - {K - 2}, 1)),
    i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
             || t[i+3] || ' ' || t[i+4]))) AS f
FROM toks""")
print("grams:", con.execute("SELECT count(*) FROM grams").fetchone()[0],
      flush=True)

con.execute(f"""
CREATE TABLE overcap AS
SELECT f FROM grams GROUP BY f HAVING count(*) > {MAXOCC}""")
print("over-cap keys:",
      con.execute("SELECT count(*) FROM overcap").fetchone()[0], flush=True)

con.execute("CREATE TABLE m(doc_id1 BIGINT, pos1 BIGINT, doc_id2 BIGINT, pos2 BIGINT)")
for c in range(CHUNKS):
    con.execute(f"""
    INSERT INTO m
    WITH capped AS (
     SELECT doc_id, pos, f FROM grams
     WHERE hash(f) % {CHUNKS} = {c}
       AND f NOT IN (SELECT f FROM overcap))
    SELECT a.doc_id, a.pos, b.doc_id, b.pos
    FROM capped a JOIN capped b
      ON a.f = b.f AND a.doc_id < b.doc_id""")
    if c % 8 == 7:
        print(f"chunk {c}: match rows so far",
              con.execute("SELECT count(*) FROM m").fetchone()[0], flush=True)

res = con.execute(f"""
WITH runs AS (
 SELECT doc_id1, doc_id2, pos1 - pos2 AS diag,
   pos1 - row_number() OVER (
     PARTITION BY doc_id1, doc_id2, pos1 - pos2 ORDER BY pos1) AS grp,
   pos1, pos2
 FROM m),
oracle AS (
 SELECT doc_id1, doc_id2,
   CAST(MIN(pos1) AS BIGINT) AS pos1,
   CAST(MIN(pos2) AS BIGINT) AS pos2,
   CAST(COUNT(*) + {K - 1} AS BIGINT) AS match_tokens
 FROM runs GROUP BY doc_id1, doc_id2, diag, grp
 HAVING COUNT(*) + {K - 1} >= {MIN}),
spark AS (
 SELECT doc_id1, doc_id2, pos1, pos2, match_tokens
 FROM read_parquet('{dump}/d35_exact_substring/*.parquet'))
SELECT
  (SELECT count(*) FROM oracle) AS oracle_rows,
  (SELECT count(*) FROM spark) AS spark_rows,
  (SELECT count(*) FROM (SELECT * FROM oracle EXCEPT SELECT * FROM spark)) AS o_minus_s,
  (SELECT count(*) FROM (SELECT * FROM spark EXCEPT SELECT * FROM oracle)) AS s_minus_o
""").fetchone()
print(f"oracle_rows={res[0]} spark_rows={res[1]} "
      f"oracle\\spark={res[2]} spark\\oracle={res[3]}")
ok = res[0] == res[1] and res[2] == 0 and res[3] == 0
print("PASS d35_exact_substring (staged sf30 pin)" if ok else
      "FAIL d35_exact_substring (staged sf30 pin)")
con.close()
os.remove(dbf)
sys.exit(0 if ok else 1)
