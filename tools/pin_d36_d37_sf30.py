#!/usr/bin/env python3
"""Staged d36 + d37 oracle pins at sf30 — completing the round-17 pin
matrix. Same staging as pin_d35_sf30.py (the monolithic two-side gram
mirror is the same ENOSPC class), extended with the probe flag, the
cross-side-only chunked join (same-id guard mirrored) and, for d37,
the covered-position excision tail.

Usage: pin_d36_d37_sf30.py <sf_dir> <spark_dump_dir>
  (<spark_dump_dir> must hold d36_contamination_sweep and
   d37_decontaminate dumps from graft.Verify at the same sf_dir)
"""
import duckdb, os, sys

sf, dump = sys.argv[1], sys.argv[2]
K, MIN, MAXOCC, CHUNKS = 5, 15, 100, 32
dbf = "/tmp/d3637pin.duckdb"
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
SELECT doc_id, doc_id % 5 = 0 AS probe,
  unnest(range(1, greatest(len(t) - {K - 2}, 1))) AS pos,
  unnest(list_transform(range(1, greatest(len(t) - {K - 2}, 1)),
    i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
             || t[i+3] || ' ' || t[i+4]))) AS f
FROM toks""")
print("grams:", con.execute("SELECT count(*) FROM grams").fetchone()[0],
      flush=True)

# full-universe occurrence cap (both sides), as the committed mirrors
con.execute(f"""
CREATE TABLE overcap AS
SELECT f FROM grams GROUP BY f HAVING count(*) > {MAXOCC}""")
print("over-cap keys:",
      con.execute("SELECT count(*) FROM overcap").fetchone()[0], flush=True)

con.execute("""CREATE TABLE m(
  probe_id BIGINT, probe_pos BIGINT, corpus_id BIGINT, corpus_pos BIGINT)""")
for c in range(CHUNKS):
    con.execute(f"""
    INSERT INTO m
    WITH capped AS (
     SELECT doc_id, probe, pos, f FROM grams
     WHERE hash(f) % {CHUNKS} = {c}
       AND f NOT IN (SELECT f FROM overcap))
    SELECT a.doc_id, a.pos, b.doc_id, b.pos
    FROM capped a JOIN capped b
      ON a.f = b.f AND a.probe AND NOT b.probe
      AND a.doc_id != b.doc_id""")
    if c % 8 == 7:
        print(f"chunk {c}: match rows so far",
              con.execute("SELECT count(*) FROM m").fetchone()[0], flush=True)

con.execute(f"""
CREATE TABLE sweep AS
WITH runs AS (
 SELECT probe_id, corpus_id, probe_pos - corpus_pos AS diag,
   probe_pos - row_number() OVER (
     PARTITION BY probe_id, corpus_id, probe_pos - corpus_pos
     ORDER BY probe_pos) AS grp,
   probe_pos, corpus_pos
 FROM m)
SELECT probe_id, corpus_id,
  CAST(MIN(probe_pos) AS BIGINT) AS probe_pos,
  CAST(MIN(corpus_pos) AS BIGINT) AS corpus_pos,
  CAST(COUNT(*) + {K - 1} AS BIGINT) AS match_tokens
FROM runs GROUP BY probe_id, corpus_id, diag, grp
HAVING COUNT(*) + {K - 1} >= {MIN}""")

r36 = con.execute(f"""
WITH spark AS (
 SELECT probe_id, corpus_id, probe_pos, corpus_pos, match_tokens
 FROM read_parquet('{dump}/d36_contamination_sweep/*.parquet'))
SELECT
  (SELECT count(*) FROM sweep),
  (SELECT count(*) FROM spark),
  (SELECT count(*) FROM (SELECT * FROM sweep EXCEPT SELECT * FROM spark)),
  (SELECT count(*) FROM (SELECT * FROM spark EXCEPT SELECT * FROM sweep))
""").fetchone()
ok36 = r36[0] == r36[1] and r36[2] == 0 and r36[3] == 0
print(f"d36: oracle={r36[0]} spark={r36[1]} diffs={r36[2]}/{r36[3]} -> "
      + ("PASS" if ok36 else "FAIL"), flush=True)

# d37 excision tail (verbatim protocol from the committed d37Sql)
r37 = con.execute(f"""
WITH spans AS (
 SELECT probe_id, probe_pos AS s, probe_pos + match_tokens - 1 AS e
 FROM sweep),
ptok AS (
 SELECT doc_id,
   unnest(range(1, len(t) + 1)) AS pos,
   unnest(t) AS tok
 FROM (SELECT doc_id, string_split(text, ' ') AS t
       FROM read_parquet('{docs}') WHERE doc_id % 5 = 0)),
covered AS (
 SELECT DISTINCT probe_id AS doc_id, unnest(range(s, e + 1)) AS pos
 FROM spans),
keptt AS (
 SELECT p.doc_id, p.pos, p.tok FROM ptok p
 LEFT JOIN covered c ON p.doc_id = c.doc_id AND p.pos = c.pos
 WHERE c.doc_id IS NULL),
agg AS (
 SELECT doc_id,
   md5(string_agg(tok, ' ' ORDER BY pos)) AS clean_md5,
   CAST(count(*) AS BIGINT) AS n_tokens_kept
 FROM keptt GROUP BY doc_id),
nsp AS (SELECT probe_id AS doc_id, CAST(count(*) AS BIGINT) AS n_spans
        FROM spans GROUP BY probe_id),
ntk AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        FROM read_parquet('{docs}') WHERE doc_id % 5 = 0),
oracle AS (
 SELECT ntk.doc_id,
   COALESCE(agg.clean_md5, md5('')) AS clean_md5,
   COALESCE(agg.n_tokens_kept, 0) AS n_tokens_kept,
   ntk.n - COALESCE(agg.n_tokens_kept, 0) AS n_tokens_removed,
   COALESCE(nsp.n_spans, 0) AS n_spans
 FROM ntk LEFT JOIN agg USING (doc_id) LEFT JOIN nsp USING (doc_id)),
spark AS (
 SELECT doc_id, clean_md5, n_tokens_kept, n_tokens_removed, n_spans
 FROM read_parquet('{dump}/d37_decontaminate/*.parquet'))
SELECT
  (SELECT count(*) FROM oracle),
  (SELECT count(*) FROM spark),
  (SELECT count(*) FROM (SELECT * FROM oracle EXCEPT SELECT * FROM spark)),
  (SELECT count(*) FROM (SELECT * FROM spark EXCEPT SELECT * FROM oracle))
""").fetchone()
ok37 = r37[0] == r37[1] and r37[2] == 0 and r37[3] == 0
print(f"d37: oracle={r37[0]} spark={r37[1]} diffs={r37[2]}/{r37[3]} -> "
      + ("PASS" if ok37 else "FAIL"), flush=True)
con.close()
os.remove(dbf)
sys.exit(0 if ok36 and ok37 else 1)
