#!/usr/bin/env python3
"""Assemble BENCH_decades_r12.json from the round-12 evidence logs.

Protocol (r10 VERDICT item 5, unchanged): every growth or A/B claim is
a SAME-WINDOW comparison with runs recorded per rung; one bench JVM at
a time; no runs=1 growth claims.

Inputs (benchlogs_r12/, one SF per file):
  pairidx_sf30.log            shared-pair-index A/B at sf30 (VERDICT item 3)
  pairidx_sf01_twins.log      survivor-universe recompute twins (ADVICE)
  advidx_sf01.log             advance-vs-rematerialize, 20% batch, sf0.1
  advidx_sf1.log              same, sf1 (cap-cascade regime, pre-split fix)
  advidx_sf1_mod64_partial.log  1.6% batch, sf1, partial-rewrite code
  advidx_sf10_mod64.log       1.6% batch, sf10
"""
import json
import os
import sys

LOGS = "benchlogs_r12"


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


def stage_block(j):
    return {"runs": j.get("runs"), "wall_sec": j["wall"],
            "cpu_sec": j["cpu_sec"], "telemetry": j.get("telemetry", {})}


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_decades_r12.json"
    doc = {"note": (
        "Round-12 decade evidence. All ratios are within-window "
        "(one bench JVM per rung, runs as recorded); warehouse + Derby "
        "metastore wiped before each timing run (metastore bloat "
        "measured inflating catalog-op-heavy stages ~3x)."),
        "sections": {}}

    # ---- VERDICT item 3: pair-index economy at the third decade ----
    p30 = last_line(f"{LOGS}/pairidx_sf30.log")
    if p30:
        w = p30["wall"]
        rec = ["s1_d12_recompute", "s2_d18_recompute", "s3_d21_recompute",
               "s4_e07_recompute"]
        idx = ["s5_materialize_doc_index", "s6_d12_from_index",
               "s7_d18_from_index", "s8_d21_from_index",
               "s9_materialize_vec_index", "s10_e07_from_index"]
        if all(k in w for k in rec + idx):
            recompute = sum(w[k] for k in rec)
            fromidx = sum(w[k] for k in idx)
            c = p30["cpu_sec"]
            sec = {"stages": {"sf30": stage_block(p30)},
                   "recompute_suite_wall_sec": round(recompute, 1),
                   "from_index_suite_wall_sec": round(fromidx, 1),
                   "wall_ratio": round(recompute / fromidx, 2),
                   "cpu_ratio": round(sum(c[k] for k in rec)
                                      / sum(c[k] for k in idx), 2),
                   "universe_note": (
                       "s7/s8 run over the exact-dedup survivor universe "
                       "(the protocol a real pipeline uses); their raw-docs "
                       "registered twins are s2/s3 — apples-to-apples "
                       "survivor-universe recompute twins (s2b/s3b) are "
                       "recorded at sf0.1 in the twins section")}
            doc["sections"]["pairidx_sf30_ab"] = sec

    # ---- ADVICE: survivor-universe recompute twins ----
    tw = last_line(f"{LOGS}/pairidx_sf01_twins.log")
    if tw:
        doc["sections"]["pairidx_twins_sf01"] = {
            "stages": {"sf0.1": stage_block(tw)},
            "note": ("s2b/s3b recompute the from-index consumers' exact "
                     "survivor-universe workload from scratch, so "
                     "s2b+s3b vs s7+s8 is the apples-to-apples per-consumer "
                     "comparison the r11 suite ratio approximated")}

    # ---- advance-vs-rematerialize economy ----
    adv = {}
    for tag, f in [("sf0.1_batch20pct", "advidx_sf01.log"),
                   ("sf1_batch20pct", "advidx_sf1.log"),
                   ("sf1_batch1.6pct", "advidx_sf1_mod64_partial.log"),
                   ("sf10_batch1.6pct", "advidx_sf10_mod64.log")]:
        j = last_line(f"{LOGS}/{f}")
        if j:
            w, c = j["wall"], j["cpu_sec"]
            ent = stage_block(j)
            if all(k in w for k in
                   ("a1_materialize_corpus80", "a2_materialize80_advance20",
                    "a3_materialize_full")):
                ent["advance_only_wall_sec"] = round(
                    w["a2_materialize80_advance20"]
                    - w["a1_materialize_corpus80"], 1)
                ent["rematerialize_full_wall_sec"] = round(
                    w["a3_materialize_full"], 1)
                ent["advance_only_cpu_sec"] = round(
                    c["a2_materialize80_advance20"]
                    - c["a1_materialize_corpus80"], 1)
                ent["rematerialize_full_cpu_sec"] = round(
                    c["a3_materialize_full"], 1)
            adv[tag] = ent
    if adv:
        doc["sections"]["advance_vs_rematerialize"] = {
            "stages": adv,
            "conclusion": (
                "The EXACT df-cap advance pays (a) ~25-30 s fixed "
                "orchestration (deep sequential AQE stage DAG — "
                "scale-invariant, amortized at corpus scale) and (b) a "
                "delta rescore proportional to the docs holding "
                "cap-BAND shingles the batch flips, not to the batch: "
                "any large corpus keeps a band of shingles near the "
                "df-cap, so even a 1.6% batch marks ~7% of sf1 docs "
                "affected and the rescore costs ~2x a full "
                "rematerialization's CPU. Exactness (pinned by the d31 "
                "oracle and PairIndexSpec's three-table equality) is "
                "what the semantics buy; a production pipeline that "
                "wants cheap daily advances freezes the capped universe "
                "per epoch and rematerializes on a schedule — that "
                "variant diverges from the d12/d13 oracles and is "
                "documented, not registered.")}
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {out_path} with sections: {list(doc['sections'])}")


if __name__ == "__main__":
    main()
