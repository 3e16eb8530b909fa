#!/usr/bin/env python3
"""Mechanize the BASELINE.md "Canary normalization v3" rule.

Usage:
    python3 tools/adjudicate.py <ref_detail.json> <now_detail.json> [top_n]

Inputs are two graft.Bench DETAIL lines (docs/BENCH_DETAIL.json or the
first JSON line of a full run's stdout), REFERENCE first. Stdlib only —
runs on the driver box like tools/check_oracle.py.

Output:
  - every instrument's whole-run host factor (strip median, basket
    median, canary, canary3) plus the shared-query steady truth, so the
    instruments can be sanity-checked against each other;
  - per-segment factors from the strip (segment k = the 30 measured
    slots after strip reading k; slot order is deterministic: sorted
    query names, pass 1 then pass 2), CONTENDED segments marked
    (reading > 1.5x the run's own strip median);
  - the top-N normalized per-query regressions, each shown with its two
    segment factors and a contended flag. The detail line records only
    min(pass1, pass2), so per-query normalization uses the SMALLER of
    the two segment factors (the min usually comes from the quieter
    pass; this is the conservative direction for flagging regressions).

A query flagged ONLY in contended segments is a window artifact per the
v3 rule - re-measure focused before treating it as a code regression.
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{"metric"'):
                return json.loads(line)
    raise SystemExit(f"no detail line in {path}")


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    ref, now = load(sys.argv[1]), load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15

    qr, qn = ref["queries"], now["queries"]
    shared = sorted(k for k in qn if k in qr and qr[k] >= 0 and qn[k] >= 0)
    truth = sum(qn[k] for k in shared) / sum(qr[k] for k in shared)
    print(f"shared queries: {len(shared)}  steady truth: {truth:.3f}")

    sref = ref.get("strip", {}).get("sec", [])
    snow = now.get("strip", {}).get("sec", [])
    factors = {}
    if sref and snow:
        mref = statistics.median(sref)
        mnow = statistics.median(snow)
        factors["strip"] = mnow / mref
        every = now["strip"].get("every", 30)
        contended = [i for i, v in enumerate(snow) if v > 1.5 * mnow]
        print(f"strip: ref median {mref:.3f}  now median {mnow:.3f}  "
              f"factor {factors['strip']:.3f}  "
              f"contended segments: {contended or 'none'}")
        seg_factor = [v / mref for v in snow]
    else:
        every, seg_factor, contended = 30, [], []
        print("strip: absent on one side (pre-r13 artifact) — "
              "whole-run factors only")
    if ref.get("basket") and now.get("basket"):
        factors["basket"] = statistics.median(
            now["basket"][k] / ref["basket"][k] for k in ref["basket"]
            if k in now["basket"])
    for c in ("canary", "canary3"):
        if ref.get(c) and now.get(c):
            (kr, vr), = ref[c].items()
            vn = now[c].get(kr)
            if vn:
                factors[c] = vn / vr
    for k, v in factors.items():
        print(f"{k:8s} factor {v:.3f}  (err vs truth {abs(v - truth):.2f})")

    host = factors.get("strip") or factors.get("basket") or truth
    names = sorted(qn)  # the Bench measurement order
    n = len(names)

    def segs(q):
        """Segment indices of q's two passes (pass1 slot i, pass2 slot n+i)."""
        i = names.index(q)
        return i // every, (n + i) // every

    rows = []
    for q in shared:
        s1, s2 = segs(q)
        f1 = seg_factor[s1] if s1 < len(seg_factor) else host
        f2 = seg_factor[s2] if s2 < len(seg_factor) else host
        f = min(f1, f2)  # min(pass) likely from the quieter segment
        norm = (qn[q] / f) / qr[q] if qr[q] > 0 and f > 0 else float("nan")
        rows.append((norm, q, qn[q], qr[q], f, s1 in contended or
                     s2 in contended))
    rows.sort(reverse=True)
    print(f"\ntop {top_n} normalized regressions "
          f"(norm = now / segment_factor / ref):")
    print(f"{'query':32s} {'ref':>7s} {'now':>7s} {'seg_f':>6s} "
          f"{'norm':>6s}  window?")
    for norm, q, vn, vr, f, cont in rows[:top_n]:
        flag = "CONTENDED-SEGMENT" if cont else ""
        print(f"{q:32s} {vr:7.2f} {vn:7.2f} {f:6.2f} {norm:6.2f}  {flag}")


if __name__ == "__main__":
    main()
