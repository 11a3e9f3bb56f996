#!/usr/bin/env python3
"""Assemble BENCH_decades_r15.json from the round-15 evidence logs.

Protocol (unchanged from r10 VERDICT item 5): every growth or A/B claim
is a SAME-WINDOW comparison with runs recorded per rung; one bench JVM
at a time; no runs=1 growth claims. Missing/unparseable inputs are
recorded in "missing_inputs" AND warned to stderr.

Round-15 additions over the r14 assembler:
 - drift ladders now carry the ONLINE ESTIMATOR validation columns
   (PairIndex.driftEstimate vs the ladder's measured drift — the
   est_vs_measured_* ratios are the adaptive-rebuild-trigger contract:
   within ~2x at every step, both shapes, two decades) (VERDICT 1);
 - a second-decade daily ladder at sf10 confirming the per-batch drift
   slopes are scale-stable (VERDICT 7);
 - direct AdvanceRung re-runs at sf1/sf30 after the broadcast-probe
   exact-dedup change (survivors probed with the batch hash set instead
   of a corpus-scale merge join) (VERDICT 5);
 - the compaction rung (tools.CompactRung): consumer wall before/after
   compactDocIndex + files/bucket + compaction cost (VERDICT 2);
 - r13/r14 standing rungs carried forward with provenance.
"""
import json
import os
import sys

LOGS = "benchlogs_r15"
R14 = "BENCH_decades_r14.json"

# r14 sections carried forward (r13 carries ride inside them)
CARRY_FROM_R14 = [
    "sf0.1_batch20pct", "sf0.1_batch6pct",
    "sf1_batch1.6pct", "sf1_batch20pct", "sf10_batch1.6pct",
    "sf1_batch1.6pct_forced_delta",
    "sf1_batch1.6pct_frozen_direct", "sf30_batch1.6pct_frozen_direct",
]

DIRECT_INPUTS = {
    # intermediate runs with ONLY the broadcast-probe change: these
    # measured that the probe alone does NOT move the sf30 advance —
    # the dominant cost of the exact-dedup decision was the corpus TEXT
    # scan + md5, not the merge join's shuffle+sort (plus ~4 s of new
    # count_batch/count_changed aggregations) — which motivated storing
    # the canonical hash as a survivors-artifact column
    "sf1_batch1.6pct_frozen_probe_only": "advrung_sf1_frozen_probeonly.log",
    "sf30_batch1.6pct_frozen_probe_only": "advrung_sf30_frozen_probeonly.log",
    # headline re-runs: broadcast probe + stored canonical-hash column
    # (the corpus side of the decision is a pruned two-column scan)
    "sf1_batch1.6pct_frozen_direct_r15": "advrung_sf1_frozen_r15.log",
    "sf30_batch1.6pct_frozen_direct_r15": "advrung_sf30_frozen_r15.log",
}

DRIFTS = {
    "drift_ladder_sf1_mod8_stress": "drift_ladder_sf1_stress.json",
    "drift_ladder_sf1_mod64_daily": "drift_ladder_sf1_daily.json",
    # second decade: 1.6% daily batches over a ~500k-doc base — the
    # slope-scale-stability check for the cadence/estimator contract
    "drift_ladder_sf10_mod64_daily": "drift_ladder_sf10_daily.json",
}

COMPACT = {"compact_rung_sf1": "compact_rung_sf1.log"}


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


def compact_section(path):
    j = None
    for ln in open(path):
        if '"metric":"compact_rung"' in ln:
            try:
                j = json.loads(ln[ln.index("{"):].strip())
            except json.JSONDecodeError:
                pass
    if j is None:
        return None
    j["note"] = (
        "standing index after N frozen advances: consumer suite "
        "(curation tail + droplist distinct) timed on the fragmented "
        "index, then compactDocIndex (timed), then the same suite on "
        "the compacted index — same window, before leg first (so page-"
        "cache warming favors the after leg; run 1 of each leg is the "
        "cold one). files_per_bucket shows the read amplification the "
        "compaction removes.")
    return j


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
               "d12 curation tail). est_* columns are the ONLINE "
               "estimator (PairIndex.driftEstimate — an O(1) read of "
               "counters the advance accumulates); est_vs_measured_* "
               "is its validation ratio against the ladder's exact-"
               "reference measurement. rebuild_wall_sec doubles as the "
               "audit-cadence cost at that corpus size.")}
    chains = d.get("chains", [])
    if not chains:
        return out
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
            "est_mean_score_drift": s.get("est_mean_score_drift"),
            "est_spurious_frac": s.get("est_spurious_frac"),
            "est_vs_measured_mean": s.get("est_vs_measured_mean"),
            "est_vs_measured_spurious": s.get("est_vs_measured_spurious"),
            "est_cum_flips": s.get("est_cum_flips"),
            "curation_exact": s["curation_exact"],
            "curation_sym_diff": s["curation_sym_diff"],
            "frac_curation_drift": s["frac_curation_drift"],
            "rebuild_wall_sec": s["rebuild_wall_sec"],
        })
    out["advance_wall_series_per_chain"] = [
        [s["advance_wall_sec"] for s in ch["steps"]] for ch in chains]
    out["warehouse_bytes_series"] = [s["warehouse_bytes"] for s in steps]
    ratios_m = [s.get("est_vs_measured_mean") for s in steps
                if s.get("est_vs_measured_mean") is not None]
    ratios_s = [s.get("est_vs_measured_spurious") for s in steps
                if s.get("est_vs_measured_spurious") is not None]
    if ratios_m:
        out["est_vs_measured_mean_range"] = [min(ratios_m), max(ratios_m)]
    if ratios_s:
        out["est_vs_measured_spurious_range"] = [min(ratios_s), max(ratios_s)]
    return out


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_decades_r15.json"
    doc = {"note": (
        "Round-15 advance-economy, frozen-cap drift and ESTIMATOR-"
        "validation evidence. Direct rungs: materialize -> advance "
        "(timed alone) -> rebuild, one session per run, no subtraction; "
        "ratios < 1.0 mean the advance beats rebuilding. Drift ladders "
        "additionally validate the online drift estimator against the "
        "exact-reference measurement (est_vs_measured_* within ~2x is "
        "the adaptive-rebuild-trigger contract). All within-window, "
        "runs as recorded; warehouse + Derby wiped per main "
        "(LocalCatalog.reset)."),
        "sections": {}, "missing_inputs": []}
    if os.path.exists(R14):
        r14 = json.load(open(R14))
        for name in CARRY_FROM_R14:
            if name in r14.get("sections", {}):
                sec = r14["sections"][name]
                sec.setdefault("provenance", "carried from " + R14)
                doc["sections"][name] = sec
            else:
                doc["missing_inputs"].append(f"r14:{name}")
    else:
        doc["missing_inputs"].append(R14)
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
    for name, fn in COMPACT.items():
        p = os.path.join(LOGS, fn)
        sec = compact_section(p) if os.path.exists(p) else None
        if sec is None:
            doc["missing_inputs"].append(fn)
            print(f"WARNING: input {fn} missing — section {name} omitted",
                  file=sys.stderr)
            continue
        doc["sections"][name] = sec
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"wrote {out_path} ({len(doc['sections'])} sections, "
          f"{len(doc['missing_inputs'])} missing)")


if __name__ == "__main__":
    main()
