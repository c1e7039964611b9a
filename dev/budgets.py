#!/usr/bin/env python3
"""Regenerate BUDGETS.json from a Bench run's bench_out.json.

BUDGETS.json pins each query's quiet-window min-of-3 sf0.1 time; Bench
compares every later run against it and reports queries >2x their budget
in the JSON's "over_budget" field — the per-query analog of the driver's
2x-of-baseline gate, so a plan regression is caught by NAME instead of
buried in the total. Budgets and the comparison run share the min-of-3
interleaved methodology on the same box, so host speed cancels in the
ratio.

Usage: python3 dev/budgets.py [bench_out.json] [BUDGETS.json]
Refresh deliberately (after an accepted perf change), never automatically.
"""
import json, sys

src = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
dst = sys.argv[2] if len(sys.argv) > 2 else "BUDGETS.json"
b = json.load(open(src))
qs = b["queries"]
assert not b.get("failed"), f"refusing budgets from a run with failures: {b['failed']}"
# "_sf" stamps the scale factor the budgets were measured at; Bench only
# applies the over_budget gate when its own sf matches (a 10x scale run
# compared against sf0.1 budgets would flag every query)
out = {"_sf": b["sf"]}
out.update({k: round(v, 3) for k, v in sorted(qs.items())})
with open(dst, "w") as f:
    json.dump(out, f, indent=1)
    f.write("\n")
print(f"[budgets] wrote {len(out)-1} budgets to {dst} "
      f"(source total {b['value']:.1f}s at {b.get('sf')})")
