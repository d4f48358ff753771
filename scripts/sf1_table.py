#!/usr/bin/env python3
"""Emit the README sf1-decade scaling table from three heavy-entry
Bench JSON dumps (sf0.01, sf0.1, sf1 — generate sf1 inputs with
scripts/gen_sf.py). The judgment column is the sf1/sf0.1 ratio against
10x data: data-proportional cost shows ~10x, per-query fixed overhead
shows ~1x; anything ABOVE ~10x is superlinear and needs a fix, not a
comment (that is how the round-8 quadratic bucketing and the
BigInt-stats checkpoint blowup were caught)."""
import json, sys

a = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_heavy_sf0.01.json"))
b = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_heavy_sf0.1.json"))
c = json.load(open(sys.argv[3] if len(sys.argv) > 3 else "/tmp/bench_heavy_sf1.json"))

print("| query | sf0.01 (s) | sf0.1 (s) | sf1 (s) | sf1/sf0.1 |")
print("|---|---|---|---|---|")
for k in sorted(a["queries"]):
    s1 = a["queries"][k]["sec"]
    s2 = b["queries"][k]["sec"]
    s3 = c["queries"][k]["sec"]
    r = s3 / s2
    flag = " **SUPERLINEAR**" if r > 10 else ""
    print(f"| `{k}` | {s1:.2f} | {s2:.2f} | {s3:.2f} | {r:.1f}x{flag} |")
print(f"| **total** | **{a['value']:.1f}** | **{b['value']:.1f}** | "
      f"**{c['value']:.1f}** | **{c['value']/b['value']:.1f}x** |")
print()
print(f"loadavg at run start: sf0.01 {a.get('loadavg_start')}, "
      f"sf0.1 {b.get('loadavg_start')}, sf1 {c.get('loadavg_start')}")
