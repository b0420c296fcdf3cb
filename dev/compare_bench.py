#!/usr/bin/env python3
"""Compare a bench artifact against dev/baseline_per_query.json.

Usage: python3 dev/compare_bench.py [bench_json] [--floor SECONDS]

Prints the median per-query ratio, every query over the 2x bar, and the
five worst ratios. Queries with an anchor below the floor (default 0.2 s)
are skipped — at that scale fixed scheduling jitter is +/-30% and ratios
are noise. Reads the sentinel block and warns when the run self-reports
contention shapes (see Bench.scala's adjudication rules).
"""
import json
import statistics
import sys


def main():
    args = sys.argv[1:]
    floor = 0.2
    if "--floor" in args:
        i = args.index("--floor")
        floor = float(args[i + 1])
        del args[i:i + 2]
    bench_path = args[0] if args else "dev/bench_latest.json"
    bench = json.load(open(bench_path))
    base = json.load(open("dev/baseline_per_query.json"))["queries"]
    if "queries" in bench:
        qs = bench["queries"]
    elif "per_query_cs" in bench:
        # compact artifact form (the 2000-char-tail-safe line): centisecond
        # values in sorted-query-name order; names reconstruct from the
        # baseline when the counts line up
        names = sorted(base)
        cs = bench["per_query_cs"]
        if len(cs) != len(names):
            sys.exit(f"compact artifact has {len(cs)} values but baseline "
                     f"has {len(names)} anchors — re-anchor first")
        qs = {n: (v / 100.0 if v >= 0 else -1.0) for n, v in zip(names, cs)}
    else:
        sys.exit("artifact has neither 'queries' nor 'per_query_cs'")
    missing = sorted(set(qs) - set(base))
    ratios = sorted(((qs[q] / base[q]["sec"], q) for q in qs
                     if q in base and base[q]["sec"] >= floor and qs[q] >= 0),
                    reverse=True)
    if not ratios:
        sys.exit("no comparable queries")
    med = statistics.median(r for r, _ in ratios)
    over = [(q, round(r, 2)) for r, q in ratios if r > 2.0]
    print(f"queries compared: {len(ratios)} (floor {floor}s); "
          f"anchors missing: {len(missing)}")
    print(f"median ratio: {med:.3f}")
    print(f"over 2x: {over if over else 'none'}")
    print("worst 5:", [(q, round(r, 2)) for r, q in ratios[:5]])
    if bench.get("value_suspect"):
        print("WARNING: artifact is value_suspect — ratios unreliable")
    for k in ("sentinel", "sentinel_heavy"):
        s = bench.get(k)
        if s:
            print(f"{k}: times={s['times']} drift={s['drift']} "
                  f"contended={s['contended']}")
    if missing:
        print("missing anchors:", ",".join(missing))


if __name__ == "__main__":
    main()
