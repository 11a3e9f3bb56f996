#!/usr/bin/env python3
"""Assemble BENCH_sf10.json from the per-chunk decade logs.

Each chunk log holds two lines: "[sf1] ... {json}" and "[sf10] ... {json}"
measured back-to-back in one window (the sandbox's wall-clock drift makes
cross-window absolute comparisons untrustworthy — growth ratios are
computed within a chunk's window only).
"""
import json, re, sys

note = sys.argv[1]
out = sys.argv[2]
logs = sys.argv[3:]

sf1, sf10, telem = {}, {}, {}
cpu1, cpu10 = {}, {}
for path in logs:
    for line in open(path):
        m = re.search(r'\[(sf1|sf10)\]', line)
        if m is None or '{' not in line:
            continue
        # anchored parse: decode exactly one JSON object starting at the
        # first '{' (a greedy .*-to-last-brace regex mis-parses lines with
        # trailing braces or two objects)
        try:
            d, _ = json.JSONDecoder().raw_decode(line[line.index('{'):])
        except json.JSONDecodeError as e:
            print(f"WARN {path}: unparseable bench line ({e}): {line[:120]}",
                  file=sys.stderr)
            continue
        dst = sf1 if m.group(1) == 'sf1' else sf10
        new = {k: round(v, 3) for k, v in d['queries'].items()}
        dup = sorted(set(dst) & set(new))
        if dup:
            print(f"WARN {path}: duplicate queries across chunk logs "
                  f"(later value wins): {dup}", file=sys.stderr)
        dst.update(new)
        cdst = cpu1 if m.group(1) == 'sf1' else cpu10
        cdst.update({k: round(v, 3) for k, v in d.get('cpu_sec', {}).items()})
        if m.group(1) == 'sf10':
            for q, t in d.get('telemetry', {}).items():
                telem[q] = t
growth = {q: round(sf10[q] / sf1[q], 2) for q in sorted(sf10) if q in sf1}
growth_cpu = {q: round(cpu10[q] / cpu1[q], 2) for q in sorted(cpu10)
              if q in cpu1 and cpu1[q] > 0}
doc = {
    "note": note,
    "sf10_dir": "/root/repo/benchdata/sf10",
    "sf1_dir": "/root/repo/benchdata/sf1",
    "runs": 3,
    "driver_mem": "64g",
    "queries_sf1_sec": dict(sorted(sf1.items())),
    "queries_sf10_sec": dict(sorted(sf10.items())),
    "growth_10x_data": growth,
    "queries_sf1_cpu_sec": dict(sorted(cpu1.items())),
    "queries_sf10_cpu_sec": dict(sorted(cpu10.items())),
    "growth_10x_data_cpu": growth_cpu,
    "components_min_label_rounds": {
        q: t.get("components.min_label_rounds") for q, t in sorted(telem.items())
        if "components.min_label_rounds" in t},
}
json.dump(doc, open(out, 'w'), indent=2)
print(json.dumps(growth, indent=1))
