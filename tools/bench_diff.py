#!/usr/bin/env python3
"""Bench trend guard: compare per-query times between two bench results
and flag regressions, so drifts like round-4's j11 0.25->1.23s surface
mechanically instead of in the judge's post-mortem.

Usage:
  tools/bench_diff.py <old> <new> [--factor F] [--floor S]

<old>/<new> may each be either a driver BENCH_r{N}.json (the per-query
map lives under "parsed"->"queries") or a raw one-line JSON from
`graft.Bench` stdout (top-level "queries").

A query REGRESSES when new_time > floor AND new_time > factor*old_time
(defaults: factor 3.0, floor 0.3s — sub-floor times are noise-class on
local[32]). New queries (absent in old) are listed informationally.
Exit 1 on any regression.
"""
import sys, json


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    q = d.get("queries")
    if not isinstance(q, dict) or not q:
        sys.exit(f"ERROR: no per-query map in {path}")
    return {k: float(v) for k, v in q.items()}, float(d.get("value", 0))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = sys.argv[1:]
    factor = float(opts[opts.index("--factor") + 1]) if "--factor" in opts else 3.0
    floor = float(opts[opts.index("--floor") + 1]) if "--floor" in opts else 0.3
    if len(args) != 2:
        sys.exit(__doc__)
    old_q, old_total = load(args[0])
    new_q, new_total = load(args[1])
    # bench keys may be prefixes of verify names (j16 vs j16_asof) in
    # one file and full names in the other; normalize BOTH sides to the
    # first-underscore prefix when that stays collision-free per side
    def keyed(q):
        pref = {k: k.split("_")[0] for k in q}
        counts = {}
        for p in pref.values():
            counts[p] = counts.get(p, 0) + 1
        return {pref[k] if counts[pref[k]] == 1 else k: v
                for k, v in q.items()}
    # normalize BOTH sides unconditionally: prefix-keyed files (the
    # driver's BENCH_r*.json) are already prefixes (identity), and
    # full-name files collapse to their unique prefixes, so files that
    # MIX the two forms still line up key by key
    old_q, new_q = keyed(old_q), keyed(new_q)
    if not (set(old_q) & set(new_q)):
        sys.exit("ERROR: no overlapping query keys between the two "
                 "files — refusing to report 'no regressions' on a "
                 "vacuous comparison")
    regressions, improved, new_only = [], [], []
    for k, nv in sorted(new_q.items()):
        ov = old_q.get(k)
        if ov is None:
            if nv < 0:
                # a BRAND-NEW query that already fails (-1 sentinel) is
                # a regression, not an informational "new" row
                regressions.append((k, None, nv))
            else:
                new_only.append((k, nv))
            continue
        if nv < 0 and ov >= 0:
            # Bench reports a THROWING query as -1 — that is the worst
            # regression there is, never a fast pass
            regressions.append((k, ov, nv))
        elif nv > floor and ov >= 0 and nv > factor * ov:
            regressions.append((k, ov, nv))
        elif ov > floor and 0 <= nv and ov > factor * nv:
            improved.append((k, ov, nv))
    print(f"total: {old_total:.2f}s -> {new_total:.2f}s "
          f"({len(new_q)} queries, {len(new_only)} new)")
    for k, ov, nv in regressions:
        if nv < 0:
            was = "NEW" if ov is None else f"{ov:.2f}s"
            print(f"REGRESSION {k}: {was} -> FAILED (-1)")
        else:
            print(f"REGRESSION {k}: {ov:.2f}s -> {nv:.2f}s (x{nv/ov:.1f})")
    for k, ov, nv in improved:
        print(f"improved   {k}: {ov:.2f}s -> {nv:.2f}s")
    for k, nv in new_only:
        print(f"new        {k}: {nv:.2f}s")
    if regressions:
        print(f"== {len(regressions)} regression(s) over factor {factor} ==")
        sys.exit(1)
    print("== no regressions ==")


if __name__ == "__main__":
    main()
