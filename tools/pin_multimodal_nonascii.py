#!/usr/bin/env python3
"""Non-ASCII multimodal oracle pin (round-18, VERDICT item 7; extended
the same round to every mirror except m07, whose 51-byte frame slices
can split codepoints and DuckDB cannot hash blobs).

The m01-m06 mirrors compute packing arithmetic in UTF-8 BYTES
(octet_length, byte padding, a codepoint->UTF-8-byte-sum CASE), so the
byte-faithful packers need no ASCII corpus. The driver's gate corpus is
ASCII-normalized and can never exercise that, so this pin injects a
deterministic multi-byte fixture (2-, 3- and 4-byte codepoints across
padding/frame boundaries) and proves full frame equality of the
committed oracle SQL vs the engine dump.

Usage:
  pin_multimodal_nonascii.py gen <fixture_dir>
  pin_multimodal_nonascii.py check <fixture_dir> <verify_out_dir> <out_json>

(run graft.Verify with SPARK_GRAFT_VERIFY_ONLY over QUERIES between
 the two steps — see tools/run_nonascii_pin.sh)
"""
import json
import os
import sys

import duckdb

QUERIES = ["m01_media_meta", "m02_byte_histogram", "m03_resize_meta",
           "m04_frame_sample", "m05_wav_meta", "m06_avi_meta"]

# deterministic multi-byte building blocks: Latin accents (2-byte),
# CJK (3-byte), emoji (4-byte), mixed with ASCII
CHUNKS = [
    "café", "naïve", "Äpfel über", "résumé", "日本語テキスト",
    "数据管道测试", "große Straße", "ascii only words here",
    "emoji 😀🎬🚀 mix", "ñandú", "πρόβλημα", "Київ", "حبيبي",
]


def gen(fix):
    os.makedirs(fix, exist_ok=True)
    rows = []
    for i in range(1, 61):
        # length sweeps 1..~40 chunks so m04 spans multiple 51-byte
        # frames and m05 hits every (channels, rate) class and pad size
        n = 1 + (i * 7) % 40
        text = " ".join(CHUNKS[(i + j) % len(CHUNKS)] for j in range(n))
        rows.append((i, text))
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    nb = con.execute(
        "SELECT count(*) FROM d WHERE strlen(text) > length(text)"
    ).fetchone()[0]
    assert nb > 0, "fixture rotted to ASCII — the pin would prove nothing"
    con.execute(f"COPY d TO '{fix}/documents.parquet' (FORMAT PARQUET)")
    # the other tables only need to EXIST for oracle_check-style view
    # registration; symlink the smallest gate SF
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        dst = f"{fix}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"/root/testdata/sf0.001/{t}.parquet", dst)
    print(f"fixture: 60 docs, {nb} with multi-byte text -> {fix}")


def check(fix, vout, out_json):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{fix}/documents.parquet'")
    nb = con.execute(
        "SELECT count(*) FROM documents WHERE strlen(text) > length(text)"
    ).fetchone()[0]
    assert nb > 0, "fixture is ASCII — refusing to record a vacuous pin"
    oracle = json.load(open(f"{vout}/oracle_sql.json"))
    results, ok = {}, True
    for name in QUERIES:
        spark = con.sql(
            f"SELECT * FROM read_parquet('{vout}/{name}/*.parquet')").df()
        duck = con.sql(oracle[name]).df()
        spark = spark.reindex(sorted(spark.columns), axis=1).sort_values(
            by=list(sorted(spark.columns)), ignore_index=True)
        duck = duck.reindex(sorted(duck.columns), axis=1).sort_values(
            by=list(sorted(duck.columns)), ignore_index=True)
        match = list(spark.columns) == list(duck.columns) and \
            len(spark) == len(duck) and spark.equals(duck)
        results[name] = {"match": bool(match), "rows": int(len(spark))}
        ok &= match
        print(("PASS" if match else "FAIL"), name, len(spark), "rows")
    doc = {
        "note": "Round-18 non-ASCII multimodal pin: the committed "
                "m03/m04/m05 oracle SQL (byte arithmetic: strlen, "
                "byte padding, codepoint->UTF-8-byte-sum) vs the "
                "byte-faithful packers on a 60-doc fixture with "
                f"{nb} multi-byte rows (2/3/4-byte codepoints). The "
                "driver's ASCII gate cannot exercise this; the pin "
                "proves the round-17 ADVICE corpus constraint is gone.",
        "fixture_multibyte_rows": int(nb),
        "results": results,
        "pass": sum(1 for r in results.values() if r["match"]),
        "fail": sum(1 for r in results.values() if not r["match"]),
    }
    json.dump(doc, open(out_json, "w"), indent=1)
    print("wrote", out_json)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    if sys.argv[1] == "gen":
        gen(sys.argv[2])
    else:
        check(sys.argv[2], sys.argv[3], sys.argv[4])
