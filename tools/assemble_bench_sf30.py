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
    # each rung's measurement protocol, recorded per-rung in the JSON so
    # growth ratios are never misread as like-for-like when one rung came
    # from a different isolation mode (sf30's per-query JVMs vs the warm
    # multi-query JVM of sf1/sf10)
    isolation = {}
    runs = {}
    for ln in open(log):
        ln = ln.strip()
        if not ln or "{" not in ln:
            continue
        tag = ln.split("]")[0][1:]
        # keep the LAST line per rung: a failed leg may have been re-run
        rungs[tag] = json.loads(ln[ln.index("{"):])
        isolation[tag] = "multi-query JVM (warm session)"
        runs[tag] = rungs[tag].get("runs")
    # sf30 came from per-query isolated JVMs (multi-query JVMs at sf30
    # accumulated >70 GiB of retained shuffle files and died on ENOSPC
    # before the periodic-GC fix); merge those lines into one rung
    try:
        q, c = {}, {}
        parts, perq_runs = None, None
        for ln in open("benchlogs_r9/sf30_perq.log"):
            ln = ln.strip()
            if not ln or "{" not in ln:
                continue
            j = json.loads(ln[ln.index("{"):])
            q.update(j["queries"])
            c.update(j["cpu_sec"])
            parts = j.get("initial_shuffle_partitions", parts)
            perq_runs = j.get("runs", perq_runs)
        if q:
            rungs["sf30"] = {"queries": q, "cpu_sec": c,
                             "initial_shuffle_partitions": parts}
            isolation["sf30"] = "per-query JVM (cold session per query)"
            runs["sf30"] = perq_runs
    except FileNotFoundError:
        pass

    def growth(num_rung, den_rung, key):
        """den-rung query -> sf-ratio; None when either leg is missing
        or recorded as failed (<= 0)."""
        res = {}
        for query, den in rungs[den_rung][key].items():
            num = rungs[num_rung][key].get(query)
            res[query] = (round(num / den, 2)
                          if num is not None and num > 0 and den > 0 else None)
        return res

    doc = {
        "note": ("Third decade datapoint (round-9 VERDICT item 7): pair-family "
                 "queries at sf1/sf10/sf30 (10x/100x/300x of sf0.1 via GenScale, "
                 "groupSize=10 so dup density is constant). Single-run decade "
                 "numbers carry the +/-2x host-noise floor recorded in NOTES.md, "
                 "so judge growth-ratio CONSISTENCY, not single ratios. sf30 "
                 "expectation for a linear plan is ~3x its sf10 number on both "
                 "axes. Per-rung protocol differs (see isolation_*): sf1/sf10 "
                 "share one warm JVM, sf30 paid a cold JVM per query — JVM/JIT "
                 "startup inflates sf30 WALL slightly; the CPU axis is the "
                 "cleaner cross-protocol comparison."),
        "driver_mem": "64g",
    }
    for tag, j in rungs.items():
        doc[f"queries_{tag}_sec"] = j["queries"]
        doc[f"queries_{tag}_cpu_sec"] = j["cpu_sec"]
        doc[f"initial_shuffle_partitions_{tag}"] = j.get("initial_shuffle_partitions")
        doc[f"isolation_{tag}"] = isolation.get(tag)
        doc[f"runs_{tag}"] = runs.get(tag)
    if "sf10" in rungs and "sf30" in rungs:
        doc["growth_3x_data"] = growth("sf30", "sf10", "queries")
        doc["growth_3x_data_cpu"] = growth("sf30", "sf10", "cpu_sec")
    if "sf1" in rungs and "sf10" in rungs:
        doc["growth_10x_data"] = growth("sf10", "sf1", "queries")
        doc["growth_10x_data_cpu"] = growth("sf10", "sf1", "cpu_sec")
    with open(out, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
