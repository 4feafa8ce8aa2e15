#!/usr/bin/env python3
"""Round-over-round bench-pair adjudication (the r12-verdict item-7 protocol).

Usage: python3 scripts/pair_compare.py NEW_A NEW_B OLD_A OLD_B [--bar 1.3]

Takes two bench pair records per round (graft.Bench JSON with `queries`,
and — from r13 on — `runs` + `run_loads` per-run telemetry), computes
min-vs-min per shared query, and prints the adjudication table the round
notes carry: query, new pair-min, old pair-min, ratio, and the 1-min
loadavg stamped immediately before the run that produced the new minimum.
Queries over the drift bar are flagged; the summary line gives median
ratio and sum-of-minima so a uniform ambient shift is distinguishable
from a localized regression at a glance. Dev-loop tooling only — not part
of the shipped library (driver-side python is allowed for the dev loop).
"""
import json
import statistics
import sys


def pair_min(a, b):
    """query -> (min_seconds, loadavg_at_that_run or None) over both records."""
    out = {}
    for q in set(a["queries"]) & set(b["queries"]):
        best = None
        for rec in (a, b):
            runs = rec.get("runs", {}).get(q)
            loads = rec.get("run_loads", {}).get(q)
            if runs:
                for i, t in enumerate(runs):
                    ld = loads[i] if loads and i < len(loads) else None
                    if best is None or t < best[0]:
                        best = (t, ld)
            else:  # pre-r13 record: only the min survives, no per-run load
                t = rec["queries"][q]
                if best is None or t < best[0]:
                    best = (t, rec.get("load", {}).get(q))
        out[q] = best
    return out


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    bar = 1.3
    for a in sys.argv[1:]:
        if a.startswith("--bar"):
            bar = float(a.split("=", 1)[1]) if "=" in a else float(sys.argv[sys.argv.index(a) + 1])
    if len(args) != 4:
        sys.exit(__doc__)
    new_a, new_b, old_a, old_b = (json.load(open(p)) for p in args)
    new = pair_min(new_a, new_b)
    old = pair_min(old_a, old_b)
    shared = sorted(set(new) & set(old))
    if not shared:
        sys.exit("no shared queries")

    ratios = {q: new[q][0] / old[q][0] for q in shared}
    flagged = [q for q in shared if ratios[q] > bar]
    heavy_flagged = [q for q in flagged if old[q][0] >= 1.0]

    print(f"{'query':<24} {'new-min':>8} {'old-min':>8} {'ratio':>6} {'min-load':>8}")
    for q in sorted(shared, key=lambda q: -ratios[q]):
        t, ld = new[q]
        mark = " <-- over bar" if q in flagged else ""
        ld_s = f"{ld:.2f}" if ld is not None else "-"
        print(f"{q:<24} {t:>8.2f} {old[q][0]:>8.2f} {ratios[q]:>6.2f} {ld_s:>8}{mark}")

    sum_new = sum(new[q][0] for q in shared)
    sum_old = sum(old[q][0] for q in shared)
    med = statistics.median(ratios.values())
    print(f"\nshared={len(shared)}  sum-of-minima {sum_new:.1f}s vs {sum_old:.1f}s "
          f"({sum_new / sum_old:.3f}x)  median ratio {med:.3f}")
    print(f"over {bar:.2f}x: {len(flagged)} total, {len(heavy_flagged)} with old-min >= 1s"
          f"{' (' + ', '.join(heavy_flagged) + ')' if heavy_flagged else ''}")
    print("new-pair ambient: "
          f"load_start {new_a.get('load_start')}/{new_b.get('load_start')}, "
          f"load_end {new_a.get('load_end')}/{new_b.get('load_end')}")
    if med > 1.1 and not heavy_flagged:
        print("verdict hint: uniform shift with no multi-second outlier -> "
              "ambient drift pattern (check min-load stamps above)")
    elif heavy_flagged:
        print("verdict hint: multi-second queries over the bar -> inspect "
              "whether their code paths changed (git diff) before blaming load")
    else:
        print("verdict hint: parity")


if __name__ == "__main__":
    main()
