#!/usr/bin/env python3
"""Builder tooling: per-family scaling table from three BENCH_FULL dumps.

    python3 tools/scale_report.py sf0.001.json sf0.01.json sf0.1.json

Groups queries by family prefix, prints family totals at each scale
factor and the step ratios. With a ~0.2-0.3 s/query fixed floor, a
healthy data-proportional family shows ratio << 10x per 10x data; the
floor-dominated families show ratio ~= 1.
"""
import json
import re
import sys


def family(name: str) -> str:
    m = re.match(r"([a-z]+)", name)
    fam = m.group(1) if m else name
    # split the TPC-H-ish q* headline queries from p* probes etc. by
    # their full prefix groups; everything else groups by letter prefix
    return fam


def main():
    dumps = [json.load(open(p)) for p in sys.argv[1:4]]
    # column labels from the dump filenames (strip dir + .json), so the
    # same script reports driver-fixture decades AND generated decades
    labels = [re.sub(r"\.json$", "", p.split("/")[-1]) for p in sys.argv[1:4]]
    fams = {}
    for i, d in enumerate(dumps):
        for q, sec in d["queries"].items():
            if sec < 0:
                continue
            f = fams.setdefault(family(q), [0.0, 0.0, 0.0, 0])
            f[i] += sec
            if i == 0:
                f[3] += 1
    print(f"{'family':<8}{'n':>4}{labels[0]:>12}{labels[1]:>12}{labels[2]:>12}"
          f"{'x(1->2)':>10}{'x(2->3)':>10}")
    tot = [0.0, 0.0, 0.0]
    for fam in sorted(fams):
        a, b, c, n = fams[fam]
        tot[0] += a; tot[1] += b; tot[2] += c
        r1 = b / a if a > 0 else float("nan")
        r2 = c / b if b > 0 else float("nan")
        print(f"{fam:<8}{n:>4}{a:>12.2f}{b:>12.2f}{c:>12.2f}{r1:>10.2f}{r2:>10.2f}")
    print(f"{'TOTAL':<8}{'':>4}{tot[0]:>12.2f}{tot[1]:>12.2f}{tot[2]:>12.2f}"
          f"{tot[1]/tot[0]:>10.2f}{tot[2]/tot[1]:>10.2f}")
    # per-query worst step ratios at the big step, floor-adjusted view
    print(f"\nLargest {labels[1]} -> {labels[2]} per-query ratios (data-bound candidates):")
    rows = []
    for q in dumps[2]["queries"]:
        b = dumps[1]["queries"].get(q, -1)
        c = dumps[2]["queries"].get(q, -1)
        if b > 0.05 and c > 0:
            rows.append((c / b, q, b, c))
    for r, q, b, c in sorted(rows, reverse=True)[:12]:
        print(f"  {q:<28}{b:>8.2f}s ->{c:>8.2f}s  x{r:.2f}")


if __name__ == "__main__":
    main()
