#!/usr/bin/env python3
"""Assemble BENCH_sf10.json from the round-18 sidecar
bench JSONs (/tmp/heavies_r18_sf1.json + /tmp/heavies_r18_sf10.json),
which carry queries/cpu_sec/telemetry maps directly — no log parsing.
This script IS the producer of the committed BENCH_sf10.json
(round-17 ADVICE 1: the artifact and the committed tool must match,
failed_queries key included).

Usage: assemble_bench_sf10_r18.py <note> <out> <sf1_sidecar> <sf10_sidecar>
"""
import json, sys

note, out, p1, p10 = sys.argv[1:5]
d1 = json.load(open(p1))
d10 = json.load(open(p10))
q1 = {k: round(v, 4) for k, v in d1["queries"].items() if v >= 0}
q10 = {k: round(v, 4) for k, v in d10["queries"].items() if v >= 0}
# Bench records -1 for a FAILED query; dropping those silently would
# make "failed at sf10" indistinguishable from "not benched" in the
# committed artifact — carry them loudly instead.
failed = sorted(set(
    [k for k, v in d1["queries"].items() if v < 0] +
    [k for k, v in d10["queries"].items() if v < 0]))
growth = {k: round(q10[k] / q1[k], 2) for k in sorted(q10) if k in q1 and q1[k] > 0}
doc = {
    "note": note,
    "sf1_dir": "/root/repo/benchdata/sf1",
    "sf10_dir": "/root/repo/benchdata/sf10",
    "runs": d10.get("runs", 2),
    "round": 18,
    "window": "r18a",
    "queries_sf1_sec": dict(sorted(q1.items())),
    "queries_sf10_sec": dict(sorted(q10.items())),
    "growth_10x": growth,
    "spill_telemetry_sf10": dict(sorted(d10.get("telemetry", {}).items())),
    "failed_queries": failed,
}
json.dump(doc, open(out, "w"), indent=1)
print(f"wrote {out}: {len(q10)} sf10 queries, failed {failed}, growth {growth}")
