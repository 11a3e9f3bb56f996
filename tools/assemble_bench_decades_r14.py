#!/usr/bin/env python3
"""Assemble BENCH_decades_r14.json from the round-14 evidence logs.

Protocol (unchanged from r10 VERDICT item 5): every growth or A/B claim
is a SAME-WINDOW comparison with runs recorded per rung; one bench JVM
at a time; no runs=1 growth claims. Missing/unparseable inputs are
recorded in "missing_inputs" AND warned to stderr.

Round-14 additions over the r13 assembler:
 - the frozen-cap DRIFT ladder (graft.tools.DriftLadder at sf1 mod-8):
   per-advance drift metrics vs an exact rebuild, the per-advance wall
   series (flatness) and warehouse footprint — the measured
   rebuild-cadence contract (VERDICT items 1+2);
 - a clean sf30 frozen rung (runs=2, min-of-runs absorbs the JVM cold
   start that contaminated r13's a1) replacing the phase-telemetry-
   derived 0.09× (VERDICT item 5);
 - a forced-delta exact rung at sf1 mod-64 (economy guard disabled —
   the audited delta path's own cost; the plain a2 rung measures what
   the guard actually does) (VERDICT item 8);
 - r13's standing rungs carried forward verbatim with provenance, so
   the four-decade economy table stays in one place.
"""
import json
import os
import sys

LOGS = "benchlogs_r14"
R13 = "BENCH_decades_r13.json"

INPUTS = {
    "sf30_batch1.6pct_frozen_clean": "advidx_sf30_mod64_frozen_clean.log",
    "sf1_batch1.6pct_forced_delta": "advidx_sf1_mod64_forced.log",
}

# DIRECT advance timing (graft.tools.AdvanceRung): no a2-a1 subtraction
# anywhere — the r14 sf30 retry proved the subtraction method is
# structurally noise-bound at that scale (±5% of a 400 s materialize
# swamps a ~20 s advance; a2f-a1 went negative AGAIN at runs=2), so the
# headline frozen ratios come from these sections
DIRECT_INPUTS = {
    # pre-fix runs, kept for the record: they surfaced the bucketed-
    # write fan-out (one file per bucket per TASK -> T x B files per
    # write; append_survivors 99-170 s for a 23.7k-row append at sf30)
    "sf1_batch1.6pct_frozen_direct_prefix": "advrung_sf1_frozen.log",
    "sf30_batch1.6pct_frozen_direct_prefix_a": "advrung_sf30_frozen.log",
    "sf30_batch1.6pct_frozen_direct_prefix_b": "advrung_sf30_frozen_gc30.log",
    # headline rungs: after Layout.writeBucketed/appendBucketed
    # repartition-by-bucket-column (exactly numBuckets files per write)
    "sf1_batch1.6pct_frozen_direct": "advrung_sf1_frozen_repart.log",
    "sf30_batch1.6pct_frozen_direct": "advrung_sf30_frozen_repart.log",
}

DRIFTS = {
    # stress shape: base = 1/8 slice, batches = 1/8 slices (corpus 8x
    # growth across the chain; maximizes flips)
    "drift_ladder_sf1_mod8_stress": "drift_ladder_sf1.json",
    # realistic daily shape: base = 89% of the corpus, seven chained
    # 1/64 batches — what the rebuild-cadence contract is written for
    "drift_ladder_sf1_mod64_daily": "drift_ladder_sf1_daily.json",
}

# r13 sections carried forward; the contaminated sf30 frozen rung is
# dropped in favor of the clean re-run above
CARRY_FROM_R13 = [
    "sf0.1_batch20pct", "sf0.1_batch6pct",
    "sf1_batch1.6pct", "sf1_batch20pct", "sf10_batch1.6pct",
]


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
                       ("forced", "a2x_materialize80_advance20_forced"),
                       ("frozen", "a2f_materialize80_frozen20")):
        if rung not in w or "a1_materialize_corpus80" not in w:
            continue
        aw = w[rung] - w["a1_materialize_corpus80"]
        ac = c[rung] - c["a1_materialize_corpus80"]
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


def advance_direct(path):
    """Section from one AdvanceRung log (direct per-operation walls)."""
    j = None
    for ln in open(path):
        if '"metric":"advance_rung"' in ln:
            try:
                j = json.loads(ln[ln.index("{"):].strip())
            except json.JSONDecodeError:
                pass
    if j is None:
        return None
    ms = j.get("measurements", [])
    sec = {"sf": j.get("sf"), "mod": j.get("mod"), "frozen": j.get("frozen"),
           "runs": j.get("runs"), "measurements": [
               {k: v for k, v in m.items() if k != "telemetry"} for m in ms],
           "telemetry_last_run": ms[-1].get("telemetry", {}) if ms else {},
           "note": ("direct timing: materialize corpus -> time the advance "
                    "alone -> time the from-scratch rebuild, all in one "
                    "session per run; no subtraction")}
    if ms:
        ratios = [m["advance_vs_rebuild_wall"] for m in ms]
        sec["advance_vs_rebuild_wall_best"] = min(ratios)
        sec["advance_vs_rebuild_wall_worst"] = max(ratios)
    return sec


def drift_summary(d):
    """Condense the DriftLadder chains into the contract table."""
    out = {"sf": d.get("sf"), "mod": d.get("mod"),
           "steps": d.get("steps"), "base": d.get("base"),
           "chain_runs": d.get("chain_runs"), "per_step": [],
           "note": (
               "k frozen advances chained over mod-N corpus slices; after "
               "each, the advanced index is compared against an exact "
               "from-scratch reference on the same corpus. frac_pairs_"
               "drifted counts score-drifted + missing + spurious pairs "
               "over the exact pair count; curation_sym_diff is the END-"
               "ANSWER delta (survivor-set symmetric difference of the "
               "d12 curation tail). rebuild_wall_sec doubles as the "
               "audit-cadence cost at that corpus size.")}
    chains = d.get("chains", [])
    if not chains:
        return out
    # metrics are deterministic across chain runs — take them from the
    # last chain; report the wall series of EVERY chain (same-window
    # flatness evidence, never averaged across runs)
    steps = chains[-1]["steps"]
    for s in steps:
        out["per_step"].append({
            "k": s["k"], "cap_flips": s["cap_flips"],
            "pairs_exact": s["pairs_exact"],
            "score_drifted": s["score_drifted"],
            "pairs_missing": s["pairs_missing"],
            "pairs_spurious": s["pairs_spurious"],
            "frac_pairs_drifted": s["frac_pairs_drifted"],
            "max_abs_jaccard_delta": s["max_abs_jaccard_delta"],
            "mean_abs_jaccard_delta": s.get("mean_abs_jaccard_delta"),
            "p99_abs_jaccard_delta": s.get("p99_abs_jaccard_delta"),
            "curation_exact": s["curation_exact"],
            "curation_sym_diff": s["curation_sym_diff"],
            "frac_curation_drift": s["frac_curation_drift"],
            "rebuild_wall_sec": s["rebuild_wall_sec"],
        })
    out["advance_wall_series_per_chain"] = [
        [s["advance_wall_sec"] for s in ch["steps"]] for ch in chains]
    out["warehouse_bytes_series"] = [s["warehouse_bytes"] for s in steps]
    return out


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_decades_r14.json"
    doc = {"note": (
        "Round-14 advance-economy + frozen-cap drift evidence. Economy "
        "rungs: advance cost = a2 - a1 (exact) / a2x - a1 (forced "
        "delta) / a2f - a1 (frozen); the bar is a3 (from-scratch "
        "rebuild of the combined corpus); ratios < 1.0 mean the advance "
        "beats rebuilding. All within-window, runs as recorded "
        "(min-of-runs medians absorb JVM cold start); warehouse + Derby "
        "metastore wiped at each main's startup (LocalCatalog.reset)."),
        "sections": {}, "missing_inputs": []}
    # carry r13's standing rungs with provenance
    if os.path.exists(R13):
        r13 = json.load(open(R13))
        for name in CARRY_FROM_R13:
            if name in r13.get("sections", {}):
                sec = r13["sections"][name]
                sec["provenance"] = "carried from BENCH_decades_r13.json"
                doc["sections"][name] = sec
            else:
                doc["missing_inputs"].append(f"r13:{name}")
    else:
        doc["missing_inputs"].append(R13)
    for name, fn in INPUTS.items():
        j = last_line(os.path.join(LOGS, fn))
        if j is None:
            doc["missing_inputs"].append(fn)
            print(f"WARNING: input {fn} missing or unparseable — "
                  f"section {name} omitted", file=sys.stderr)
            continue
        doc["sections"][name] = advance_economy(j)
    if "sf30_batch1.6pct_frozen_clean" in doc["sections"]:
        doc["sections"]["sf30_batch1.6pct_frozen_clean"]["note"] = (
            "SUBTRACTION method (a2f - a1), retained as evidence that it "
            "is noise-bound at sf30: even at runs=2 min-of-runs the a2f-a1 "
            "difference is negative because the ~400 s materialize's same-"
            "window variance exceeds the ~20 s advance. The headline sf30 "
            "frozen number is the DIRECT section below.")
    for name, fn in DIRECT_INPUTS.items():
        p = os.path.join(LOGS, fn)
        sec = advance_direct(p) if os.path.exists(p) else None
        if sec is None:
            doc["missing_inputs"].append(fn)
            print(f"WARNING: input {fn} missing or unparseable — "
                  f"section {name} omitted", file=sys.stderr)
            continue
        doc["sections"][name] = sec
    for name, fn in DRIFTS.items():
        dp = os.path.join(LOGS, fn)
        if os.path.exists(dp):
            doc["sections"][name] = drift_summary(json.load(open(dp)))
        else:
            doc["missing_inputs"].append(fn)
            print(f"WARNING: {dp} missing — drift section omitted",
                  file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"wrote {out_path} ({len(doc['sections'])} sections, "
          f"{len(doc['missing_inputs'])} missing)")


if __name__ == "__main__":
    main()
