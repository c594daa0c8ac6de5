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

STORM-AWARE (round-5 lesson: BENCH_r05 ran under hypervisor steal
storms, steal_ticks 30225 vs 21, and every "regression" was clean on a
local rerun): the newer bench's own annotations demote slowdowns —
  - a query in its `stormy` list (every rep storm-hit) is SUSPECT;
  - a whole run with steal_ticks > 500 is storm-contaminated, so ALL
    slowdowns are SUSPECT — re-measure with `tools/dev.sh graft.Bench`;
  - a query that THREW (-1) stays a hard regression regardless (steal
    makes queries slow, not wrong).

CANARY-AWARE (round-9 lesson: /proc/stat steal is blind to whole-host
slowdowns that are not hypervisor steal — BENCH_r09 read steal_ticks 75
yet inflated 11 untouched queries 3-6x, among them the frozen scan+agg
canary x1 0.15->0.51): if any CANARY query — p0/x1/d1, trivial shapes
whose code never changes round to round — inflates >= 2x vs its
ABSOLUTE pinned clean band, the run is host-contaminated and ALL
slowdowns demote to SUSPECT, same as a steal storm. Max-of-canaries,
not median: the r09 slowdown was bursty, so canaries measured outside
the burst read flat. The band is ABSOLUTE (round-11 lesson: BENCH_r10's
canaries were themselves storm-inflated, p0 0.40, so r11's p0 0.37 read
1.14x "clean" RELATIVELY while sitting ~2.1x the true band —
consecutive storm artifacts masked each other and a 13x storm-absorbed
stage line went hard). Band pinned from the committed clean rounds
r03/r04/r08 (steal <= 207); keep in sync with BenchTrend.CanaryCleanBand
and docs/BENCH.md. Exit 1 only on hard regressions.
"""
import argparse
import json
import re
import sys

STORM_RUN_TICKS = 500
ADJUDICATIONS_FILE = "BENCH_ADJUDICATIONS.json"
# absolute clean-host canary band (s), pinned AT sf0.1 — see module
# docstring; mirrors BenchTrend.CanaryCleanBand. A run recorded at a
# different sf falls back to the relative check: the band's seconds are
# incomparable off-scale (sf1 canaries read ~10x band and would demote
# every real regression; sf0.01 storms read under-band and go hard).
CANARY_BAND = {"p0": 0.18, "x1": 0.15, "d1": 0.11}
# clean-host UPPER bands (s, sf0.1) for the storm-absorbing long
# stages: a line tripping the ratio rule but AT/UNDER its pinned clean
# ceiling is the stage performing exactly as its committed clean record
# says (the comparison artifact was merely fast) — info, never red.
# Mirrors BenchTrend.StageCleanBand; re-pin only from idle-host records
# noted in docs/BENCH.md.
STAGE_CLEAN_BAND = {"s:dump": 4.6, "s:dumpsynth": 2.0,
                    "s:dedup": 2.5, "s:lrdist": 2.7}
CANARY_STORM_FACTOR = 2.0
SUB_SECOND_BAND = 1.0
MAX_ISOLATED_SUB_SECOND = 2


def load(path):
    """-> (query_times, total, steal_ticks, stormy_prefixes, sf)."""
    with open(path) as f:
        txt = f.read()
    d = json.loads(txt)
    m = re.search(r'sf\\?"\s*:\s*\\?"([^"\\]+)', txt)
    sf = m.group(1) if m else None
    # annotations live on the bench_detail line: top-level in raw
    # output, inside the escaped "tail" string in a driver file — regex
    # over the raw text catches both (max = the run-level figure)
    ticks = max((int(m) for m in
                 re.findall(r'steal_ticks\\?"\s*:\s*(\d+)', txt)),
                default=0)
    stormy = set()
    # token class includes ':' so stage keys ("stage:ccdist_labels")
    # tokenize whole and prefix-normalize like everything else
    for grp in re.findall(r'stormy\\?"\s*:\s*\[([^\]]*)\]', txt):
        stormy.update(w.split("_")[0].replace("stage:", "s:")
                      for w in re.findall(r"[\w:]+", grp))
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    q = d.get("queries")
    if not isinstance(q, dict) or not q:
        sys.exit(f"ERROR: no per-query map in {path}")
    return ({k: float(v) for k, v in q.items()},
            float(d.get("value", 0)), ticks, stormy, sf)


def adjudicated_for(new_path):
    """Prefix-normalized queries adjudicated for basename(new_path) in
    the committed ledger (searched beside the bench file, then cwd).

    The ledger is the round-12 loop fix: post-session driver artifacts
    measuring UNTOUCHED code turned the guard red four rounds running,
    with each triage living only in docs/BENCH.md prose. An entry binds
    ONE bench file to ONE query with a written disposition — reviewed
    data the guard consults, not a waiver class. Throws (-1) are never
    adjudicable (steal makes queries slow, not wrong); BenchTrend
    applies the same rules from the same file."""
    import os
    for d in (os.path.dirname(os.path.abspath(new_path)), "."):
        p = os.path.join(d, ADJUDICATIONS_FILE)
        if os.path.isfile(p):
            with open(p) as f:
                entries = json.load(f)
            return {e["query"].split("_")[0].replace("stage:", "s:")
                    for e in entries
                    if e.get("file") == os.path.basename(new_path)}
    return set()


def main():
    ap = argparse.ArgumentParser(
        description="bench trend diff (see module docstring)")
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--factor", type=float, default=3.0)
    ap.add_argument("--floor", type=float, default=0.3)
    ns = ap.parse_args()
    factor, floor = ns.factor, ns.floor
    old_q, old_total, _, _, _ = load(ns.old)
    new_q, new_total, ticks, stormy, new_sf = load(ns.new)
    storm_run = ticks > STORM_RUN_TICKS
    # bench keys may be prefixes of verify names (j16 vs j16_asof) in
    # one file and full names in the other; normalize BOTH sides to the
    # first-underscore prefix when that stays collision-free per side
    def keyed(q):
        # "stage:" keys compress to "s:" on the tightest contract rung;
        # normalize both spellings so old/new files line up
        pref = {k: k.split("_")[0].replace("stage:", "s:") for k in q}
        counts = {}
        for p in pref.values():
            counts[p] = counts.get(p, 0) + 1
        return {pref[k] if counts[pref[k]] == 1 else k: v
                for k, v in q.items()}
    old_q, new_q = keyed(old_q), keyed(new_q)
    if not (set(old_q) & set(new_q)):
        sys.exit("ERROR: no overlapping query keys between the two "
                 "files — refusing to report 'no regressions' on a "
                 "vacuous comparison")
    # one scale predicate for both band consumers (canary + stage) —
    # a drift between two spellings would apply one band off-scale
    band_scale = new_sf is None or "sf0.1" in new_sf
    # canary normalization: worst ratio of the newer run's canaries vs
    # the ABSOLUTE pinned clean band — never the previous artifact,
    # whose canaries may themselves be storm-inflated (r10->r11
    # masking). Off the band's scale, fall back to the relative form.
    if band_scale:
        canary_factor = max(
            (new_q[k] / band for k, band in CANARY_BAND.items()
             if new_q.get(k, -1) >= 0),
            default=1.0)
    else:
        canary_factor = max(
            (new_q[k] / old_q[k] for k in CANARY_BAND
             if old_q.get(k, 0) >= 0.02 and new_q.get(k, -1) >= 0),
            default=1.0)
    canary_run = canary_factor >= CANARY_STORM_FACTOR
    adjudicated_qs = adjudicated_for(ns.new)
    regressions, suspects, adjudicated, in_band, improved, new_only = \
        [], [], [], [], [], []
    # isolated sub-second slowdowns demote to suspect (round-10 lesson:
    # seven same-code runs showed lone untouched sub-second lines
    # swinging x3.4-3.7 with steal 0 and canaries < 2x — a14 0.28->0.95
    # in exactly one run, w8 0.17->0.63 in exactly the next); MORE than
    # MAX_ISOLATED_SUB_SECOND of them is a broad slowdown and stays
    # hard, as do throws and >= SUB_SECOND_BAND slowdowns
    slow_sub = []
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
            # regression there is, never a fast pass (and never
            # storm-excusable)
            regressions.append((k, ov, nv))
        elif nv > floor and ov >= 0 and nv > factor * ov:
            # match at PREFIX granularity like BenchTrend: driver bench
            # files carry prefix keys only, and the inventory pins
            # prefix uniqueness (BenchContractSpec), so prefix == query
            if k.split("_")[0].replace("stage:", "s:") in adjudicated_qs:
                adjudicated.append((k, ov, nv))
            elif band_scale and nv <= STAGE_CLEAN_BAND.get(
                    k.split("_")[0].replace("stage:", "s:"),
                    float("-inf")):
                in_band.append((k, ov, nv))
            elif storm_run or canary_run or k in stormy:
                suspects.append((k, ov, nv))
            elif nv < SUB_SECOND_BAND:
                slow_sub.append((k, ov, nv))
            else:
                regressions.append((k, ov, nv))
        elif ov > floor and 0 <= nv and ov > factor * nv:
            improved.append((k, ov, nv))
    if len(slow_sub) <= MAX_ISOLATED_SUB_SECOND:
        suspects.extend(slow_sub)
    else:
        regressions.extend(slow_sub)
    print(f"total: {old_total:.2f}s -> {new_total:.2f}s "
          f"({len(new_q)} queries, {len(new_only)} new, "
          f"newer steal_ticks={ticks}, canary_factor={canary_factor:.2f})")
    def ratio(nv, ov):
        # driver maps are 2-decimal rounded, so ov can be exactly 0.00
        return nv / max(ov, 1e-9)
    for k, ov, nv in regressions:
        if nv < 0:
            was = "NEW" if ov is None else f"{ov:.2f}s"
            print(f"REGRESSION {k}: {was} -> FAILED (-1)")
        else:
            print(f"REGRESSION {k}: {ov:.2f}s -> {nv:.2f}s "
                  f"(x{ratio(nv, ov):.1f})")
    isolated = {k for k, _, _ in slow_sub}
    for k, ov, nv in suspects:
        why = ("isolated sub-second swing" if k in isolated
               else "storm-contaminated run" if storm_run
               else f"canary-inflated run (x{canary_factor:.1f})"
               if canary_run and k not in stormy else "stormy-marked")
        print(f"SUSPECT    {k}: {ov:.2f}s -> {nv:.2f}s "
              f"(x{ratio(nv, ov):.1f}) "
              f"[{why}; re-measure: tools/dev.sh graft.Bench]")
    for k, ov, nv in adjudicated:
        print(f"ADJUDICATED {k}: {ov:.2f}s -> {nv:.2f}s "
              f"(x{ratio(nv, ov):.1f}) "
              f"[reviewed disposition in {ADJUDICATIONS_FILE}]")
    for k, ov, nv in in_band:
        print(f"INBAND     {k}: {ov:.2f}s -> {nv:.2f}s "
              f"(x{ratio(nv, ov):.1f}) "
              f"[inside the pinned clean band "
              f"{STAGE_CLEAN_BAND[k.split('_')[0].replace('stage:', 's:')]}s]")
    for k, ov, nv in improved:
        print(f"improved   {k}: {ov:.2f}s -> {nv:.2f}s")
    for k, nv in new_only:
        print(f"new        {k}: {nv:.2f}s")
    if regressions:
        print(f"== {len(regressions)} regression(s) over factor {factor} ==")
        sys.exit(1)
    if suspects:
        print(f"== no hard regressions; {len(suspects)} storm-suspect "
              "slowdown(s) need a clean local re-measure ==")
        return
    print("== no regressions ==")


if __name__ == "__main__":
    main()
