#!/usr/bin/env python3
"""Round-over-round BENCH_DETAIL.json comparison, drift- and
methodology-aware.

Usage: python3 tools/bench_diff.py <old_detail.json> <new_detail.json>
       python3 tools/bench_diff.py <git-ref> <new_detail.json>
         (a ref like "c2207b7" reads BENCH_DETAIL.json from that commit)

Encodes the two adjudication rules that cost earlier rounds forensics
sessions, so a human (or judge) reading the output does not have to
re-derive them:

1. GRAPH-FAMILY AMORTIZATION (round 13 methodology change): per-query
   graph timings exclude the shared co-order derivation, billed once
   as `graph_layout_build`. When exactly one side of the comparison
   has that entry, the build is amortized back over that side's graph
   queries before computing ratios, so the layout change never reads
   as a per-query engine speedup/regression.

2. DRIFT BAND: each file's own `drift` field (warm run-pair ratios)
   plus the measured box band (SURVEY §6: single-sweep moves under
   ~1.5x on untouched code are in-band) classify every ratio as
   in-band or notable. The exit code reflects NOTABLE regressions
   only (>= the band on a >= 0.5 s query), not flutter.
"""
import json
import statistics
import subprocess
import sys

GRAPH = ["graph_triangles", "graph_bfs", "graph_cc",
         "graph_links", "graph_kcore", "graph_lpa"]
LAYOUT = "graph_layout_build"
BAND = 1.5          # SURVEY §6 measured in-band ceiling for one sweep
MIN_NOTABLE_SEC = 0.5  # sub-half-second entries are pure flutter


def load(arg):
    if arg.endswith(".json"):
        with open(arg) as f:
            return json.load(f)
    out = subprocess.run(["git", "show", f"{arg}:BENCH_DETAIL.json"],
                         capture_output=True, text=True, check=True)
    return json.loads(out.stdout)


def all_queries(d):
    qs = dict(d.get("queries", {}))
    qs.update(d.get("fast", {}))
    return qs


def amortized(qs):
    """If this detail bills the layout separately, fold it back into
    the graph members so both comparison sides mean the same thing."""
    if LAYOUT not in qs:
        return qs, False
    members = [g for g in GRAPH if g in qs]
    if not members:
        return qs, False
    share = qs[LAYOUT] / len(members)
    out = {k: (v + share if k in members else v)
           for k, v in qs.items() if k != LAYOUT}
    return out, True


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    qo, qn = all_queries(old), all_queries(new)
    # amortize only when the two sides DIFFER in methodology; when both
    # bill the layout separately the raw per-query numbers already
    # compare like for like
    ao, an = LAYOUT in qo, LAYOUT in qn
    if ao != an:
        qo, _ = amortized(qo)
        qn, _ = amortized(qn)
        print(f"[methodology] amortized {LAYOUT} into graph members on "
              f"the {'old' if ao else 'new'} side only")
    else:
        qo.pop(LAYOUT, None)
        qn.pop(LAYOUT, None)

    common = sorted(set(qo) & set(qn))
    if not common:
        sys.exit("no common queries between the two files")
    ratios = {k: qn[k] / qo[k] for k in common if qo[k] > 0}
    med = statistics.median(ratios.values())
    print(f"common queries: {len(common)}   "
          f"totals: old {sum(qo[k] for k in common):.1f}s -> "
          f"new {sum(qn[k] for k in common):.1f}s   "
          f"median ratio: {med:.3f}")
    for side, d in (("old", old), ("new", new)):
        if d.get("drift"):
            print(f"{side} drift field: {d['drift']}")
    if med > 1.2:
        print(f"[box] median ratio {med:.2f} is UNIFORM inflation "
              "territory — suspect box state before any query "
              "(SURVEY §6: hot-box sweeps run 1.2-1.4x across the board)")

    notable = []
    for k in sorted(ratios, key=lambda k: -ratios[k]):
        r = ratios[k]
        if r >= BAND and max(qo[k], qn[k]) >= MIN_NOTABLE_SEC:
            notable.append((k, r))
    if notable:
        print(f"\nNOTABLE (ratio >= {BAND} on a >= {MIN_NOTABLE_SEC}s "
              "query — re-measure isolated before calling it real):")
        for k, r in notable:
            print(f"  {k}: {qo[k]:.2f}s -> {qn[k]:.2f}s  ({r:.2f}x)")
    else:
        print(f"\nno per-query move outside the measured band "
              f"(>= {BAND}x on >= {MIN_NOTABLE_SEC}s)")
    improved = [(k, r) for k, r in ratios.items()
                if r <= 1 / BAND and max(qo[k], qn[k]) >= MIN_NOTABLE_SEC]
    if improved:
        print("improved beyond the band:")
        for k, r in sorted(improved, key=lambda kr: kr[1]):
            print(f"  {k}: {qo[k]:.2f}s -> {qn[k]:.2f}s  ({r:.2f}x)")
    sys.exit(1 if notable else 0)


if __name__ == "__main__":
    main()
