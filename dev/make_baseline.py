#!/usr/bin/env python3
"""Build/extend dev/baseline_per_query.json — the machine-readable per-query
perf baseline the "within 2x" bench gate compares against (BASELINE.md
narrates the anchors; this file is the complete enforceable table).

Usage: python3 dev/make_baseline.py [--reset q1,q2,...] [bench_json]

Rules:
 - an existing anchor is PRESERVED (the reference point stays fixed across
   rounds, so regressions accumulate against the original clean number);
 - queries absent from the baseline are added from the given clean bench
   artifact (default dev/bench_latest.json);
 - --reset re-anchors the named queries (for semantics changes: the old
   number measured a different computation);
 - a run with value_suspect=true is refused as an anchor source.
"""
import json
import sys
import datetime


def main():
    args = sys.argv[1:]
    reset = set()
    if args and args[0] == "--reset":
        reset = set(x for x in args[1].split(",") if x)
        args = args[2:]
    bench_path = args[0] if args else "dev/bench_latest.json"
    bench = json.load(open(bench_path))
    if bench.get("value_suspect"):
        sys.exit("refusing to anchor on a value_suspect bench run")
    try:
        base = json.load(open("dev/baseline_per_query.json"))
    except FileNotFoundError:
        base = {
            "unit": "sec",
            "note": ("per-query clean-run anchors (min-of-N, local[32], "
                     "sf0.1, noop sink); see BASELINE.md for methodology "
                     "and host-noise adjudications"),
            "queries": {},
        }
    qs = base["queries"]
    stamp = datetime.date.today().isoformat()
    added, reanchored = [], []
    for name, sec in sorted(bench["queries"].items()):
        if sec < 0:
            continue  # failed query: never an anchor
        if name in reset:
            qs[name] = {"sec": sec, "anchored": stamp}
            reanchored.append(name)
        elif name not in qs:
            qs[name] = {"sec": sec, "anchored": stamp}
            added.append(name)
    with open("dev/baseline_per_query.json", "w") as f:
        json.dump(base, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"baseline: {len(qs)} queries; +{len(added)} added, "
          f"{len(reanchored)} re-anchored")
    if added:
        print("added:", ",".join(added))
    if reanchored:
        print("re-anchored:", ",".join(reanchored))


if __name__ == "__main__":
    main()
