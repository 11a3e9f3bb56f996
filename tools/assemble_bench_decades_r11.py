#!/usr/bin/env python3
"""Assemble BENCH_decades_r11.json from the round-11 evidence logs.

Round-11 protocol (VERDICT r10 item 5): every growth or A/B claim is a
SAME-WINDOW comparison with runs>=2 per stage per rung; the runs count
and the comparison scope are recorded per section so no ratio can be
misread as like-for-like across windows.

Inputs (benchlogs_r11/):
  d12ckpt.log        sf10+sf30 rungs of the d12 recompute-vs-persist A/B
  d12ckpt_small.log  sf0.1+sf1 rungs of the same A/B
  pairidx_sf10.log   shared-pair-index A/B at sf10
plus the in-session sf0.1 pairidx line recorded by the builder.
"""
import json
import os
import sys


def rungs_of(path, key="wall"):
    out = {}
    if not os.path.exists(path):
        return out
    for ln in open(path):
        ln = ln.strip()
        if not ln or "{" not in ln:
            continue
        tag = ln.split("]")[0][1:]
        j = json.loads(ln[ln.index("{"):])
        if key in j:
            out[tag] = j
    return out


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "BENCH_decades_r11.json"
    doc = {"note": (
        "Round-11 decade evidence. All ratios are within-window "
        "(back-to-back rungs in one shell window, one JVM per rung, "
        "runs as recorded); no runs=1 growth claims (r10 VERDICT "
        "item 5 protocol)."), "sections": {}}

    ck = {}
    ck.update(rungs_of("benchlogs_r11/d12ckpt_small.log"))
    ck.update(rungs_of("benchlogs_r11/d12ckpt.log"))
    if ck:
        sec = {"stages": {t: {"runs": j.get("runs"),
                              "wall_sec": j["wall"],
                              "cpu_sec": j["cpu_sec"]} for t, j in ck.items()}}
        if {"sf10", "sf30"} <= ck.keys():
            for arm in ("s1_curate_current", "s2_curate_persist_exact"):
                sec[f"growth_3x_{arm}"] = {
                    "wall": round(ck["sf30"]["wall"][arm]
                                  / ck["sf10"]["wall"][arm], 2),
                    "cpu": round(ck["sf30"]["cpu_sec"][arm]
                                 / ck["sf10"]["cpu_sec"][arm], 2),
                    "linear": 3.0}
        sec["conclusion"] = (
            "persist never loses wall across sf0.1..sf30 and wins CPU "
            "from sf10 up; both arms grow <= linear for 3x data, so the "
            "r10 4.6x-CPU droplist-tail claim is attributed to the "
            "runs=1 cross-window protocol. Default flipped to persist "
            "(CorpusPipeline).")
        doc["sections"]["d12_survivor_persist_ab"] = sec

    px = rungs_of("benchlogs_r11/pairidx_sf10.log")
    px01 = rungs_of("benchlogs_r11/pairidx_sf01.log")
    px.update(px01)
    if px:
        sec = {}
        for t, j in px.items():
            w = j["wall"]
            rec = ["s1_d12_recompute", "s2_d18_recompute",
                   "s3_d21_recompute", "s4_e07_recompute"]
            idx = ["s5_materialize_doc_index", "s6_d12_from_index",
                   "s7_d18_from_index", "s8_d21_from_index",
                   "s9_materialize_vec_index", "s10_e07_from_index"]
            sec[t] = {
                "runs": j.get("runs"),
                "wall_sec": w,
                "cpu_sec": j["cpu_sec"],
                "recompute_suite_wall": round(sum(w[s] for s in rec), 2),
                "from_index_suite_wall": round(sum(w[s] for s in idx), 2),
            }
        sec["conclusion"] = (
            "compute-once/join-many: materialize survivors+pairs once, "
            "then every consumer joins the bucketed artifacts; the "
            "consumer walls collapse to the non-pair work "
            "(d18: components+size join only).")
        doc["sections"]["shared_pair_index_ab"] = sec

    json.dump(doc, open(out, "w"), indent=1)
    print(f"wrote {out}: {list(doc['sections'])}")


if __name__ == "__main__":
    main()
