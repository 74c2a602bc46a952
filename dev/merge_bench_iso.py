#!/usr/bin/env python3
"""Merge isolated per-family re-runs into a full-run sf100 bench JSON so
the committed artifact is self-interpreting (round-11 verdict: in-run
numbers for write-adjacent families are 2-3x overstated by page-cache
eviction from ~40 GB of preceding writes; the isolated truth lived only
in a side notes file).

Usage: merge_bench_iso.py <full.json> <out.json> <iso.json>...

Output = full.json plus:
  queries_isolated: {name: secs} for every query present in an iso file
  queries_effective: queries overlaid with the isolated readings (the
    number a consumer should use per family)
  isolation_note: one-paragraph explanation embedded in the artifact
"""
import json, sys

full = json.load(open(sys.argv[1]))
iso = {}
for p in sys.argv[3:]:
    d = json.load(open(p))
    iso.update(d.get("queries", {}))

eff = dict(full["queries"])
eff.update(iso)
full["queries_isolated"] = iso
full["queries_effective"] = eff
full["total_effective"] = round(sum(eff.values()), 3)
full["isolation_note"] = (
    "queries[] are in-run readings from one JVM running every family "
    "back-to-back; families that follow large writers (q81/q90/q100/q107 "
    "emit tens of GB) read 2-3x high from page-cache eviction. "
    "queries_isolated[] re-ran those families solo (fresh JVM, idle box) "
    "and queries_effective[] overlays them; use queries_effective for "
    "per-family comparisons and total_effective for the ladder.")
json.dump(full, open(sys.argv[2], "w"), indent=1)
print(f"merged {len(iso)} isolated readings; total_effective={full['total_effective']}")
