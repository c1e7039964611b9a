#!/usr/bin/env python3
"""Regenerate BUDGETS.json from a Bench run's bench_out.json.

BUDGETS.json pins each query's quiet-window min-of-3 sf0.1 time; Bench
compares every later run against it and reports queries >2x their budget
in the JSON's "over_budget" field — the per-query analog of the driver's
2x-of-baseline gate, so a plan regression is caught by NAME instead of
buried in the total. Budgets and the comparison run share the min-of-3
interleaved methodology on the same box, so host speed cancels in the
ratio — mostly. Round 12 measured a genuine HOST-SPEED DRIFT between
rounds (the unchanged r11 commit ran one query 2.5x slower on the r12
box), so budget files also stamp "_probe": the source run's fixed
calibration-probe time. Bench divides its own probe by the stamp to get
"drift_factor" and prints drift-normalized over-budget ratios beside the
raw ones: raw 1.9x at drift 1.8 is a slow box, raw 1.9x at drift 1.0 is
a plan regression.

Usage: python3 dev/budgets.py [bench_out.json] [BUDGETS.json]
       python3 dev/budgets.py --selftest
Refresh deliberately (after an accepted perf change), never automatically.
"""
import json, sys


def build(bench, prior=None):
    """bench_out.json dict -> budgets dict (the file we write)."""
    assert not bench.get("failed"), (
        f"refusing budgets from a run with failures: {bench['failed']}")
    # "_sf" stamps the scale factor the budgets were measured at; Bench only
    # applies the over_budget gate when its own sf matches (a 10x scale run
    # compared against sf0.1 budgets would flag every query). "_probe"
    # stamps the source box's calibration probe for drift normalization.
    # "_excluded.<query>" records (policy decisions, not measurements) are
    # carried over from the prior budgets file, never regenerated away.
    out = {"_sf": bench["sf"]}
    if "probe" in bench:
        out["_probe"] = round(bench["probe"], 3)
    for k, v in sorted((prior or {}).items()):
        if k.startswith("_excluded."):
            out[k] = v
    out.update({k: round(v, 3) for k, v in sorted(bench["queries"].items())})
    return out


def selftest():
    bench = {"sf": "/tmp/sfX", "probe": 1.234567,
             "queries": {"b": 2.0, "a": 1.23456}, "failed": []}
    out = build(bench)
    assert out["_sf"] == "/tmp/sfX"
    assert out["_probe"] == 1.235, out
    assert out["a"] == 1.235 and out["b"] == 2.0, out
    # meta keys must never collide with query budgets: Bench strips exactly
    # {_sf, _probe} before the >2x compare
    assert set(k for k in out if k.startswith("_")) == {"_sf", "_probe"}
    # a probe-less bench (old record) still builds, just without the stamp
    assert "_probe" not in build({"sf": "x", "queries": {}, "failed": []})
    # _excluded.* policy records survive regeneration; stale budgets do not
    prior = {"_sf": "old", "_excluded.x_exact": "output-bound oracle floor",
             "zz_dropped": 9.9}
    out2 = build(bench, prior)
    assert out2["_excluded.x_exact"] == "output-bound oracle floor"
    assert "zz_dropped" not in out2
    # a run with failures must refuse
    try:
        build({"sf": "x", "queries": {}, "failed": ["q_boom"]})
        raise SystemExit("selftest FAILED: accepted a run with failures")
    except AssertionError:
        pass
    # drift math as Bench applies it: probe 2.4 vs stamp 1.2 -> factor 2.0,
    # raw ratio 3.0 normalizes to 1.5
    factor = 2.4 / 1.2
    assert abs(3.0 / factor - 1.5) < 1e-9
    print("[budgets] selftest OK")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest()
        sys.exit(0)
    src = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
    dst = sys.argv[2] if len(sys.argv) > 2 else "BUDGETS.json"
    b = json.load(open(src))
    try:
        prior = json.load(open(dst))
    except (FileNotFoundError, ValueError):
        prior = None
    out = build(b, prior)
    meta = sum(1 for k in out if k.startswith("_"))
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"[budgets] wrote {len(out)-meta} budgets to {dst} "
          f"(source total {b['value']:.1f}s at {b.get('sf')}, "
          f"probe {b.get('probe', 'n/a')})")
