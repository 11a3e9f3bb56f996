#!/usr/bin/env python3
"""Staged DuckDB oracle for the d21 sf30 pin (round-11, VERDICT item 4).

The monolithic d21 mirror holds the shingle index, the posting pairs,
the token relation, and the transitive closure in one plan — its
combined spill exceeds this sandbox's ~74 GB scratch at sf30, failing
with ENOSPC twice (benchlogs_r11/d21_sf30_pin.log). This script runs
the SAME SQL fragments (copied verbatim from TextQueries.d21Sql's
CTE chain) as FOUR stages, each in a fresh DuckDB connection with its
intermediates written to parquet and its spill freed before the next
stage — peak scratch is the largest single stage (the d07-class
posting-pair stage, already proven at sf30), not the sum.

  stage A  documents -> capped-Jaccard pairs           (d07 fragment)
  stage B  pairs -> connected-component labels          (recursive CTE)
  stage C  documents + shared micro-nat costs -> scores (d19 fragment,
           including the chk validation against DuckDB's own ln)
  stage D  best-per-cluster + singletons -> final, exact-compare with
           the Spark parquet (columns sorted, rows sorted, exact diff
           — identical to tools/oracle_check.py's canon compare)

Usage: pin_d21_sf30.py <sfDir> <sparkOutDir> [workDir]
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

SHARED_GLOB = "/tmp/graft_shared_oracle/lm_costs/*.parquet"


def connect(work):
    con = duckdb.connect()
    con.sql("SET preserve_insertion_order=false")
    con.sql(f"SET temp_directory='{work}/duck_spill'")
    if os.environ.get("ORACLE_MEMORY_LIMIT"):
        con.sql(f"SET memory_limit='{os.environ['ORACLE_MEMORY_LIMIT']}'")
    return con


def docs_view(con, sfdir):
    path = f"{sfdir}/documents.parquet"
    pat = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{pat}'")


def stage_a_pairs(sfdir, work):
    """d21Sql's sh/post/card/inter/pairs chain, verbatim semantics."""
    con = connect(work)
    docs_view(con, sfdir)
    con.sql(f"""
COPY (
WITH sh AS (
 SELECT DISTINCT doc_id,
  unnest(list_transform(range(1, greatest(len(tokens) - 1, 1)),
         i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS s
 FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents)
),
post AS (SELECT s, list_sort(list(doc_id)) AS docs FROM sh
         GROUP BY s HAVING count(*) <= 100),
card AS (SELECT doc_id, count(*) AS n
         FROM (SELECT unnest(docs) AS doc_id FROM post) GROUP BY doc_id),
inter AS (SELECT p.doc_id1 AS doc_id1, p.doc_id2 AS doc_id2, count(*) AS n_inter
          FROM (SELECT unnest(flatten(list_transform(range(1, len(docs)), i ->
                  list_transform(range(i + 1, len(docs) + 1), j ->
                    {{'doc_id1': docs[i], 'doc_id2': docs[j]}})))) AS p
                FROM post WHERE len(docs) >= 2)
          GROUP BY 1, 2)
SELECT doc_id1, doc_id2 FROM inter
JOIN card c1 ON doc_id1 = c1.doc_id
JOIN card c2 ON doc_id2 = c2.doc_id
WHERE CAST(n_inter AS DOUBLE)
      / CAST(c1.n + c2.n - n_inter AS DOUBLE) >= 0.6
) TO '{work}/pairs.parquet' (FORMAT PARQUET)""")
    (n,) = con.sql(f"SELECT count(*) FROM '{work}/pairs.parquet'").fetchone()
    con.close()
    return n


def stage_b_components(work):
    """d21Sql's sym/reach/cc/csize fragment over the staged pairs."""
    con = connect(work)
    con.sql(f"""
COPY (
WITH RECURSIVE
pairs AS (SELECT doc_id1, doc_id2 FROM '{work}/pairs.parquet'),
sym AS (SELECT doc_id1 AS src, doc_id2 AS dst FROM pairs
        UNION SELECT doc_id2, doc_id1 FROM pairs),
reach(v, u) AS (
  SELECT src, src FROM sym
  UNION
  SELECT r.v, s.dst FROM reach r JOIN sym s ON r.u = s.src),
cc AS (SELECT v, MIN(u) AS lbl FROM reach GROUP BY v)
SELECT v, lbl,
  CAST(COUNT(*) OVER (PARTITION BY lbl) AS BIGINT) AS cluster_size
FROM cc
) TO '{work}/cc.parquet' (FORMAT PARQUET)""")
    (n,) = con.sql(f"SELECT count(*) FROM '{work}/cc.parquet'").fetchone()
    con.close()
    return n


def stage_c_scores(sfdir, work):
    """d21Sql's toks/cnt/tot/shared/chk/nlp/score fragment, including
    the shared-cost validation against DuckDB's own ln (within 1
    micro-nat) — a failed validation aborts loudly here instead of
    silently emptying the join."""
    con = connect(work)
    docs_view(con, sfdir)
    ok, nshared, ncnt = con.sql(f"""
WITH toks AS (
 SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cnt),
shared AS (SELECT tok, cnt, nlp_micro FROM read_parquet('{SHARED_GLOB}'))
SELECT CASE WHEN
    (SELECT count(*) FROM shared) = (SELECT count(*) FROM cnt) AND
    (SELECT count(*) FROM shared n
       JOIN cnt c ON n.tok = c.tok AND n.cnt = c.c
       CROSS JOIN tot
       WHERE abs(n.nlp_micro
                 - CAST(round(ln(CAST(t AS DOUBLE) / CAST(c.c AS DOUBLE))
                              * 1000000) AS BIGINT)) <= 1)
      = (SELECT count(*) FROM cnt)
  THEN 1 ELSE 0 END,
  (SELECT count(*) FROM shared), (SELECT count(*) FROM cnt)""").fetchone()
    if ok != 1:
        raise SystemExit(
            f"FAIL d21_sf30: shared cost table failed validation "
            f"(shared={nshared} cnt={ncnt}) — was Verify run on this sfDir?")
    con.sql(f"""
COPY (
WITH toks AS (
 SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
nlp AS (SELECT tok, nlp_micro FROM read_parquet('{SHARED_GLOB}'))
SELECT doc_id, CAST(SUM(nlp_micro) AS DOUBLE) / count(*) AS sc
FROM toks JOIN nlp USING (tok) GROUP BY doc_id
) TO '{work}/score.parquet' (FORMAT PARQUET)""")
    (n,) = con.sql(f"SELECT count(*) FROM '{work}/score.parquet'").fetchone()
    con.close()
    return n


def stage_d_final(sfdir, work, sparkdir):
    con = connect(work)
    docs_view(con, sfdir)
    oracle = con.sql(f"""
WITH cc AS (SELECT v, lbl, cluster_size FROM '{work}/cc.parquet'),
score AS (SELECT doc_id, sc FROM '{work}/score.parquet'),
best AS (SELECT v AS doc_id, lbl AS cluster_rep, cluster_size,
           'best_in_cluster' AS kept_reason
         FROM (SELECT cc.v, cc.lbl, cc.cluster_size,
                 row_number() OVER (PARTITION BY cc.lbl
                                    ORDER BY score.sc, cc.v) AS rk
               FROM cc JOIN score ON cc.v = score.doc_id)
         WHERE rk = 1),
singles AS (SELECT doc_id, doc_id AS cluster_rep,
              CAST(1 AS BIGINT) AS cluster_size,
              'singleton' AS kept_reason
            FROM documents WHERE doc_id NOT IN (SELECT v FROM cc))
SELECT * FROM best UNION ALL SELECT * FROM singles
ORDER BY doc_id""").df()
    con.close()
    spark_files = glob.glob(f"{sparkdir}/d21_cluster_curation/*.parquet")
    if not spark_files:
        raise SystemExit("FAIL d21_sf30: no spark output parquet")
    spark = pd.concat([pd.read_parquet(f) for f in spark_files],
                      ignore_index=True)

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.sort_values(by=list(df.columns), ignore_index=True)
        for c in df.columns:
            if df[c].dtype == object:
                try:
                    df[c] = pd.to_numeric(df[c])
                except (ValueError, TypeError):
                    pass
        return df

    a, b = canon(spark), canon(oracle)
    rows = len(a) == len(b)
    schema = list(a.columns) == list(b.columns)
    match = rows and schema and a.equals(b)
    print(json.dumps({"query": "d21_cluster_curation",
                      "sf_dir": sfdir,
                      "rows_match": rows, "schema_match": schema,
                      "hash_match": bool(match),
                      "spark_rows": len(a), "oracle_rows": len(b)}))
    return match


def main():
    sfdir = sys.argv[1]
    sparkdir = sys.argv[2]
    work = sys.argv[3] if len(sys.argv) > 3 else "/root/d21_pin_work"
    os.makedirs(work, exist_ok=True)
    n = stage_a_pairs(sfdir, work)
    print(f"stage A: {n} pairs", flush=True)
    n = stage_b_components(work)
    print(f"stage B: {n} labeled vertices", flush=True)
    n = stage_c_scores(sfdir, work)
    print(f"stage C: {n} scored docs", flush=True)
    ok = stage_d_final(sfdir, work, sparkdir)
    print("PASS d21_cluster_curation (staged sf30 oracle)" if ok
          else "FAIL d21_cluster_curation (staged sf30 oracle)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
