#!/usr/bin/env python3
"""Assemble BENCH_decades_r10.json from the round-10 benchlogs.

Round-10's decade evidence deliberately holds the PROTOCOL fixed
within each comparison (warm multi-query JVM per rung, one window per
log, process-CPU carried as the drift check) — the round-9 artifact
showed cross-protocol ratios (cold per-query sf30 vs warm sf1/sf10)
inflate apparent growth up to ~2x. Every ratio here is computed only
within its own log file.

Usage: python3 tools/assemble_bench_decades_r10.py [out.json]
"""
import json
import sys


def rungs_of(path, key="queries"):
    out = {}
    for ln in open(path):
        ln = ln.strip()
        if not ln or "{" not in ln:
            continue
        tag = ln.split("]")[0][1:]
        j = json.loads(ln[ln.index("{"):])
        # Bench prints a compact headline line AFTER the full line
        # (round-11); keep only lines carrying the requested map
        if key in j:
            out[tag] = j
    return out


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "BENCH_decades_r10.json"
    doc = {
        "note": ("Round-10 within-window decade evidence. Each section's ratios "
                 "come from ONE chunk log (benchlogs_r10/) with a warm "
                 "multi-query JVM per rung; sf30 rungs are runs=1 and carry "
                 "the recorded +/-2x single-run noise floor, so judge ratio "
                 "consistency across sections, not single decimals. linear "
                 "growth for an sf10->sf30 rung is 3.0x."),
    }

    # d18 attribution + onedir fix (d18_decade.log: sf10 legacy-sym,
    # sf30 onedir mid-script; ccab.log: both variants in ONE JVM)
    dd = rungs_of("benchlogs_r10/d18_decade.log")
    if {"sf10", "sf30"} <= dd.keys():
        doc["d18_decade_attribution"] = {
            "sf10_wall_sec": dd["sf10"]["queries"]["d18_dup_clusters"],
            "sf30_wall_sec": dd["sf30"]["queries"]["d18_dup_clusters"],
            "sf10_cpu_sec": dd["sf10"]["cpu_sec"]["d18_dup_clusters"],
            "sf30_cpu_sec": dd["sf30"]["cpu_sec"]["d18_dup_clusters"],
            "growth_3x_wall": round(
                dd["sf30"]["queries"]["d18_dup_clusters"]
                / dd["sf10"]["queries"]["d18_dup_clusters"], 2),
            "growth_3x_cpu": round(
                dd["sf30"]["cpu_sec"]["d18_dup_clusters"]
                / dd["sf10"]["cpu_sec"]["d18_dup_clusters"], 2),
            "d07_reference_growth_3x_wall": round(
                dd["sf30"]["queries"]["d07_jaccard_pairs"]
                / dd["sf10"]["queries"]["d07_jaccard_pairs"], 2),
            "sf30_phase_wall_ms": dd["sf30"]["telemetry"]["d18_dup_clusters"],
        }
    cc = rungs_of("benchlogs_r10/ccab.log")
    if cc:
        doc["components_sym_ab_same_jvm"] = {
            tag: {"legacy_union_wall_sec": j["wall"]["s1_legacy_sym2e"],
                  "onedir_lazy_wall_sec": j["wall"]["s2_onedir_lazy_sym"],
                  "legacy_union_cpu_sec": j["cpu_sec"]["s1_legacy_sym2e"],
                  "onedir_lazy_cpu_sec": j["cpu_sec"]["s2_onedir_lazy_sym"]}
            for tag, j in cc.items()}

    dp = rungs_of("benchlogs_r10/d18_product.log")
    if {"sf1", "sf10", "sf30"} <= dp.keys():
        w = {t: dp[t]["queries"]["d18_dup_clusters"] for t in dp}
        c = {t: dp[t]["cpu_sec"]["d18_dup_clusters"] for t in dp}
        doc["d18_product_post_fix"] = {
            "wall_sec": w, "cpu_sec": c,
            "product_30x_wall": round(w["sf30"] / w["sf1"], 1),
            "product_30x_cpu": round(c["sf30"] / c["sf1"], 1),
            "note": ("this log's sf30 rung is a single cold-ish run in a "
                     "window where the identical code+data measured 413.9 s "
                     "(ccab, same-JVM warmest) and 522.7 s (d18_decade) "
                     "earlier the same day - the +/-2x single-run decade "
                     "noise floor applies to the product; see "
                     "d18_growth_3x_all_windows for the spread"),
        }
    # every within-window sf10->sf30 growth measured for d18 this round,
    # all onedir code at sf30: the spread IS the noise floor statement
    g = {}
    if {"sf10", "sf30"} <= dd.keys():
        g["d18_decade_log"] = round(
            dd["sf30"]["queries"]["d18_dup_clusters"]
            / dd["sf10"]["queries"]["d18_dup_clusters"], 2)
    if {"sf10", "sf30"} <= cc.keys():
        g["ccab_log_onedir_same_jvm"] = round(
            cc["sf30"]["wall"]["s2_onedir_lazy_sym"]
            / cc["sf10"]["wall"]["s2_onedir_lazy_sym"], 2)
    if {"sf10", "sf30"} <= dp.keys():
        # derive from dp directly: `w` above only exists when sf1 is
        # also present (it is needed for the 30x product), and a failed
        # sf1 leg must degrade this section, not NameError the script
        g["d18_product_log"] = round(
            dp["sf30"]["queries"]["d18_dup_clusters"]
            / dp["sf10"]["queries"]["d18_dup_clusters"], 2)
    if g:
        g["linear"] = 3.0
        doc["d18_growth_3x_all_windows"] = g

    d12 = rungs_of("benchlogs_r10/d12_decade.log")
    if {"sf10", "sf30"} <= d12.keys():
        doc["d12_decade_warm_protocol"] = {
            "sf10_wall_sec": d12["sf10"]["queries"]["d12_corpus_curation"],
            "sf30_wall_sec": d12["sf30"]["queries"]["d12_corpus_curation"],
            "growth_3x_wall": round(
                d12["sf30"]["queries"]["d12_corpus_curation"]
                / d12["sf10"]["queries"]["d12_corpus_curation"], 2),
            "growth_3x_cpu": round(
                d12["sf30"]["cpu_sec"]["d12_corpus_curation"]
                / d12["sf10"]["cpu_sec"]["d12_corpus_curation"], 2),
        }

    q32 = rungs_of("benchlogs_r10/q32_skew.log")
    if q32:
        doc["q32_skew_ab"] = {
            tag: {"unsalted_no_skewopt_sec": j["wall"]["s1_unsalted_noskewopt"],
                  "unsalted_aqe_skew_sec": j["wall"]["s2_unsalted_aqe_skew"],
                  "salted_sec": j["wall"]["s3_salted"]}
            for tag, j in q32.items()}

    with open(out, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
