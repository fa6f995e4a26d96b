"""Merge N full-suite BENCH_FULL.json artifacts into a repeat-min stamp.

Per query (engine AND oracle legs independently): the MINIMUM across
runs — the established local protocol for stamping on a steal-prone VM
(BASELINE.md: a genuine regression reproduces on every run; a steal
window rarely covers all of them). Raw artifacts stay committed next to
the stamp so adjudication can see the spread.

Usage: python3 tools/merge_bench_min.py OUT.json RUN1.json RUN2.json ...
"""
import json, sys

out, runs = sys.argv[1], [json.load(open(p)) for p in sys.argv[2:]]
names = set()
for r in runs:
    names |= set(r.get("queries", {}))

def mins(field):
    m = {}
    for n in sorted(names):
        vals = [r.get(field, {}).get(n) for r in runs]
        vals = [v for v in vals if v is not None]
        if vals:
            m[n] = min(vals)
    return m

q, o = mins("queries"), mins("oracle_sec")
matched = [n for n in q if n in o]
eng, orc = sum(q[n] for n in matched), sum(o[n] for n in matched)
stamp = {
    "metric": "total", "value": round(sum(q.values()), 3), "unit": "sec",
    "protocol": f"per-query min over {len(runs)} full-suite runs (engine and oracle legs independently)",
    "engine_sec_matched": round(eng, 3), "oracle_sec_matched": round(orc, 3),
    "ratio": round(eng / orc, 3),
    "queries": {n: round(v, 3) for n, v in sorted(q.items())},
    "oracle_sec": {n: round(v, 3) for n, v in sorted(o.items())},
    "sf": runs[0].get("sf"),
}
json.dump(stamp, open(out, "w"), indent=None)
print(f"stamped {out}: engine {sum(q.values()):.1f} total; matched {eng:.1f}/{orc:.1f} = {eng/orc:.3f}x over {len(matched)} queries")
