#!/usr/bin/env python3
"""Assemble BENCH_decades_r13.json from the round-13 evidence logs.

Protocol (unchanged from r10 VERDICT item 5): every growth or A/B claim
is a SAME-WINDOW comparison with runs recorded per rung; one bench JVM
at a time; no runs=1 growth claims.

Unlike the r12 assembler (ADVICE: silent omission of absent inputs),
every declared input that is missing or unparseable is recorded in a
"missing_inputs" list in the output AND warned to stderr — the JSON
can never imply coverage it lacks.

Inputs (benchlogs_r13/): advidx ladders, one SF x batch-fraction per
file, each with rungs a1 (materialize corpus), a2 (materialize +
EXACT advance), a2f (materialize + FROZEN advance), a3 (materialize
combined from scratch). The advance cost is a2 - a1 (resp. a2f - a1);
the rebuild cost it must beat is a3.
"""
import json
import os
import sys

LOGS = "benchlogs_r13"

INPUTS = {
    "sf0.1_batch20pct": "advidx_sf01_mod5_v2.log",
    "sf0.1_batch6pct": "advidx_sf01_mod16_v2.log",
    "sf1_batch1.6pct": "advidx_sf1_mod64_v2.log",
    "sf1_batch20pct": "advidx_sf1_mod5_v2.log",
    "sf10_batch1.6pct": "advidx_sf10_mod64.log",
    # fourth decade: frozen-vs-rebuild only (exact already characterized
    # as ~1.2x at sf1/sf10; a2 at sf30 would cost ~an hour for a known
    # answer) — a2f/a1/a3 via SPARK_GRAFT_STAGE_FILTER
    "sf30_batch1.6pct_frozen_only": "advidx_sf30_mod64_frozen.log",
}


def last_line(path):
    """Last full BenchStages JSON line ("wall" map present) of a log."""
    if not os.path.exists(path):
        return None
    out = None
    for ln in open(path):
        if '"wall"' not in ln or "{" not in ln:
            continue
        try:
            j = json.loads(ln[ln.index("{"):].strip())
        except json.JSONDecodeError:
            continue
        if "wall" in j:
            out = j
    return out


def advance_economy(j):
    """Per-rung advance-vs-rebuild economics from one ladder JSON."""
    w, c = j["wall"], j["cpu_sec"]
    sec = {"runs": j.get("runs"), "sf": j.get("sf"),
           "wall_sec": w, "cpu_sec": c,
           "telemetry": j.get("telemetry", {})}
    runs = j.get("runs") or 1
    for mode, rung in (("exact", "a2_materialize80_advance20"),
                       ("frozen", "a2f_materialize80_frozen20")):
        if rung not in w or "a1_materialize_corpus80" not in w:
            continue
        aw = w[rung] - w["a1_materialize_corpus80"]
        ac = c[rung] - c["a1_materialize_corpus80"]
        # the operator's own per-phase wall telemetry (summed over the
        # stage's runs) is the drift-immune advance measurement — the
        # a2-a1 subtraction assumes the two rungs saw the same window,
        # which the sf30 run disproves (a1 absorbed the cold start and
        # exceeds a3); when the subtraction goes negative, the phase
        # sum is the only honest number and the ratio uses it
        tel = j.get("telemetry", {}).get(rung, {})
        phase_ms = sum(v for k, v in tel.items()
                       if k.startswith("pairindex.advance_ms_"))
        phase_wall = phase_ms / 1000.0 / runs if phase_ms else None
        if phase_wall is not None:
            sec[f"{mode}_advance_phase_wall_sec"] = round(phase_wall, 3)
        sec[f"{mode}_advance_wall_sec"] = round(aw, 3)
        sec[f"{mode}_advance_cpu_sec"] = round(ac, 3)
        if "a3_materialize_full" in w:
            if aw > 0:
                sec[f"{mode}_advance_vs_rebuild_wall"] = round(
                    aw / w["a3_materialize_full"], 3)
            elif phase_wall is not None:
                sec[f"{mode}_advance_vs_rebuild_wall_from_phases"] = round(
                    phase_wall / w["a3_materialize_full"], 3)
                sec[f"{mode}_note"] = (
                    "a2-a1 negative (a1 window-contaminated); "
                    "ratio from per-phase telemetry")
            if ac > 0:
                sec[f"{mode}_advance_vs_rebuild_cpu"] = round(
                    ac / c["a3_materialize_full"], 3)
    return sec


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_decades_r13.json"
    doc = {"note": (
        "Round-13 advance-economy evidence. advance cost = a2 - a1 "
        "(exact) / a2f - a1 (frozen); the bar is a3 (from-scratch "
        "rebuild of the combined corpus). Ratios < 1.0 mean the "
        "advance beats rebuilding. All within-window, runs as "
        "recorded; warehouse + Derby metastore wiped at each "
        "BenchStages startup (LocalCatalog.reset)."),
        "sections": {}, "missing_inputs": []}
    for name, fn in INPUTS.items():
        j = last_line(os.path.join(LOGS, fn))
        if j is None:
            doc["missing_inputs"].append(fn)
            print(f"WARNING: input {fn} missing or unparseable — "
                  f"section {name} omitted", file=sys.stderr)
            continue
        doc["sections"][name] = advance_economy(j)
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"wrote {out_path} ({len(doc['sections'])} sections, "
          f"{len(doc['missing_inputs'])} missing)")


if __name__ == "__main__":
    main()
