#!/usr/bin/env python3
"""Compare two Bench JSON records (the full per-query line).

Usage: python3 tools/bench_compare.py <old.json> <new.json> [ratio_gate]
                                      [--json OUT.json]
                                      [--rows OLD_CORRECTNESS.json NEW_CORRECTNESS.json]
Prints per-query ratios for queries present in both (sorted worst
first), new/removed queries, and totals. Exit 1 if any common query
regressed past the gate (default 2.0x) with an absolute delta > 0.2s
(sub-noise times can't "regress"). With --json, also writes the full
comparison as a machine-readable artifact (the committed
BENCH_r{N}_compare.json round record).

With --rows (two CORRECTNESS_r{N}.json paths), each "regression" whose
spark_rows changed between the two correctness records is tagged
workload_changed instead — the semantics grew (r09: the PNG arm grew
q_media_phash's corpus 375->875 rows, a 6x time delta that was not a
plan regression). workload_changed entries carry old_rows/new_rows and
do NOT trip the exit-1 gate; the artifact self-adjudicates without
BASELINE.md prose.
"""
import sys, json

json_out = None
if "--json" in sys.argv:
    i = sys.argv.index("--json")
    json_out = sys.argv[i + 1]
    del sys.argv[i:i + 2]

rows_old, rows_new = {}, {}
if "--rows" in sys.argv:
    i = sys.argv.index("--rows")

    def load_rows(p):
        try:
            d = json.load(open(p))
            return {k: v.get("spark_rows") for k, v in d.items()
                    if isinstance(v, dict) and v.get("spark_rows") is not None}
        except (OSError, json.JSONDecodeError) as e:
            print(f"warn: could not read rows from {p}: {e}", file=sys.stderr)
            return {}

    rows_old = load_rows(sys.argv[i + 1])
    rows_new = load_rows(sys.argv[i + 2])
    del sys.argv[i:i + 3]


def load(p):
    for line in open(p):
        i = line.find('{"metric"')
        if i >= 0 and '"queries"' in line:
            return json.loads(line[i:].strip())
    # pretty-printed record (the saved BENCH_r*_local.json files)
    with open(p) as f:
        try:
            d = json.load(f)
            if "queries" in d:
                return d
        except json.JSONDecodeError:
            pass
    raise SystemExit(f"no full record in {p}")


old, new = load(sys.argv[1]), load(sys.argv[2])
gate = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
oq = {k: v for k, v in old["queries"].items() if v >= 0}
nq = {k: v for k, v in new["queries"].items() if v >= 0}
common = sorted(set(oq) & set(nq),
                key=lambda k: -(nq[k] / oq[k] if oq[k] > 0 else 1))
# gate over ALL common queries (truncating here would let a large
# absolute regression hide behind 15 sub-noise high-ratio queries)
over_gate = [k for k in common
             if (nq[k] / oq[k] if oq[k] > 0 else float("inf")) > gate
             and nq[k] - oq[k] > 0.2]
# adjudicate: a gate-tripping delta whose result row count changed
# between the correctness records is grown/shrunk semantics, not a
# plan regression — tag it, don't fail on it
workload_changed = [k for k in over_gate
                    if k in rows_old and k in rows_new
                    and rows_old[k] != rows_new[k]]
bad = [k for k in over_gate if k not in workload_changed]
print(f"old total {old['value']:.1f}s/{len(oq)}q   "
      f"new total {new['value']:.1f}s/{len(nq)}q")
for k in [k for k in common if k in over_gate] + \
         [k for k in common if k not in over_gate][:15]:
    r = nq[k] / oq[k] if oq[k] > 0 else float("inf")
    if k in workload_changed:
        flag = (f"  <-- workload_changed"
                f" (rows {rows_old[k]} -> {rows_new[k]})")
    elif k in bad:
        flag = "  <-- REGRESSION"
    else:
        flag = ""
    print(f"{k:28s} {oq[k]:7.2f} -> {nq[k]:7.2f}  {r:5.2f}x{flag}")
ratios = sorted(nq[k] / oq[k] for k in common if oq[k] > 0)
if ratios:
    print(f"median ratio over {len(common)} common: "
          f"{ratios[len(ratios)//2]:.2f}x")
print("new-only:", " ".join(sorted(set(nq) - set(oq))) or "-")
print("removed:", " ".join(sorted(set(oq) - set(nq))) or "-")
if json_out:
    rec = {
        "old": {"path": sys.argv[1], "total_sec": old["value"], "n": len(oq)},
        "new": {"path": sys.argv[2], "total_sec": new["value"], "n": len(nq)},
        "gate": gate,
        "median_ratio": ratios[len(ratios) // 2] if ratios else None,
        "worst": [
            {"query": k, "old_sec": oq[k], "new_sec": nq[k],
             "ratio": (nq[k] / oq[k] if oq[k] > 0 else None)}
            for k in common[:10]],
        "regressions": [
            {"query": k, "old_sec": oq[k], "new_sec": nq[k],
             "ratio": nq[k] / oq[k]} for k in bad],
        "workload_changed": [
            {"query": k, "old_sec": oq[k], "new_sec": nq[k],
             "ratio": nq[k] / oq[k],
             "old_rows": rows_old[k], "new_rows": rows_new[k]}
            for k in workload_changed],
        "new_only": sorted(set(nq) - set(oq)),
        "removed": sorted(set(oq) - set(nq)),
        "ratios": {k: (nq[k] / oq[k] if oq[k] > 0 else None) for k in common},
    }
    with open(json_out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {json_out}")
sys.exit(1 if bad else 0)
