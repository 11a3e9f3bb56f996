#!/usr/bin/env python3
"""Split graft.Explain output into plans/<round>/<query>_<tag>.txt files.

Usage: split_plans.py <explain_log> <out_dir> <tag>
  e.g. split_plans.py /tmp/explain_r20_before.log plans/r20 before

Explain prints '===== <query> =====' headers; everything until the next
header is that query's formatted plan. sbt log prefixes are stripped.
"""
import re
import sys
import pathlib

log, out_dir, tag = sys.argv[1], pathlib.Path(sys.argv[2]), sys.argv[3]
out_dir.mkdir(parents=True, exist_ok=True)

cur, buf = None, []
n = 0


def flush():
    global n
    if cur:
        (out_dir / f"{cur}_{tag}.txt").write_text("".join(buf))
        n += 1


for raw in open(log, errors="replace"):
    line = re.sub(r"^\[(info|error|warn)\]\s?", "", raw)
    m = re.match(r"^===== (\S+) =====", line)
    if m:
        flush()
        cur, buf = m.group(1), []
    elif cur is not None:
        buf.append(line)
flush()
print(f"wrote {n} plans to {out_dir}")
