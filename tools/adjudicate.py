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
  - the top-N normalized per-query regressions, each shown with its
    effective segment factor and a contended flag.

Strip readings of -1.0 are failed reads (graft.Bench keeps them in
place to preserve slot alignment): excluded from medians, and their
segment falls back to the whole-run factor.

Per-query normalization: when the detail line carries the raw per-pass
maps ("p1"/"p2", emitted from round 13), each pass is divided by its
OWN segment's factor before taking the min — the v3 rule as stated.
For older artifacts without p1/p2 the tool falls back to dividing the
stored min by the smaller of the two segment factors (conservative:
over-flags rather than hides; re-measure focused before acting).

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

    sref = [v for v in ref.get("strip", {}).get("sec", []) if v >= 0]
    snow_raw = now.get("strip", {}).get("sec", [])
    snow = [v for v in snow_raw if v >= 0]
    factors = {}
    if sref and snow:
        mref = statistics.median(sref)
        mnow = statistics.median(snow)
        factors["strip"] = mnow / mref
        every = now["strip"].get("every", 30)
        contended = [i for i, v in enumerate(snow_raw) if v > 1.5 * mnow]
        failed = [i for i, v in enumerate(snow_raw) if v < 0]
        print(f"strip: ref median {mref:.3f}  now median {mnow:.3f}  "
              f"factor {factors['strip']:.3f}  "
              f"contended segments: {contended or 'none'}"
              + (f"  failed reads: {failed}" if failed else ""))
        # failed reading -> that segment falls back to the run factor
        seg_factor = [v / mref if v >= 0 else mnow / mref for v in snow_raw]
    else:
        every, seg_factor, contended = 30, [], []
        print("strip: absent on one side (pre-r13 artifact) — "
              "whole-run factors only")
    host_g = now.get("host", {})
    if host_g.get("cpu_stall_us"):
        # PSI totals are cumulative us. Sample 0 is taken at run start
        # and sample k+1 immediately AFTER strip reading k (Bench's
        # gauge cadence), so delta[i] = sample[i+1]-sample[i] covers
        # strip SEGMENT i-1 (plus reading i); delta[0] spans only the
        # first strip read itself. A -1 (failed) sample stays in place
        # and voids the two deltas it touches — dropping it would shift
        # every later delta off its segment, the same slot-alignment
        # discipline Bench applies to failed strip reads.
        def deltas(key):
            v = host_g.get(key, [])
            return [(b - a) if (a >= 0 and b >= 0) else None
                    for a, b in zip(v, v[1:])]
        cpu_d, mem_d, io_d = (deltas(k + "_stall_us")
                              for k in ("cpu", "mem", "io"))
        def tot(d):
            return sum(x for x in d if x is not None)
        mm = [x for x in host_g.get("mem_mb", []) if x >= 0]
        if mm:
            print(f"host: MemAvailable {min(mm)}-{max(mm)} MB; "
                  f"PSI stall totals over run (s): "
                  f"cpu {tot(cpu_d)/1e6:.1f} mem {tot(mem_d)/1e6:.1f} "
                  f"io {tot(io_d)/1e6:.1f}")
        # delta index i>=1 labels strip segment i-1 (delta[0] is the
        # pre-suite span — reported as 'pre' if it ever dominates)
        hot = sorted((i for i in range(len(cpu_d))
                      if cpu_d[i] is not None and cpu_d[i] > 0),
                     key=lambda i: -cpu_d[i])[:3]
        if hot:
            def seg_label(i):
                return "pre" if i == 0 else str(i - 1)
            print("host: top cpu-stall segments (segment: stall_s): "
                  + "  ".join(f"{seg_label(i)}: {cpu_d[i]/1e6:.1f}"
                              for i in hot))
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

    # explicit membership checks, not truthiness: a (theoretical) 0.0
    # factor must read as "present and alarming", not "absent"
    host = next((factors[k] for k in ("strip", "basket") if k in factors),
                truth)
    names = sorted(qn)  # the Bench measurement order
    n = len(names)
    p1, p2 = now.get("p1", {}), now.get("p2", {})
    # per-pass task-metrics maps (round-14 Bench telemetry): spill bytes
    # and GC ms per measured query, keyed like p1/p2
    spl = (now.get("spl1", {}), now.get("spl2", {}))
    gc = (now.get("gc1", {}), now.get("gc2", {}))

    def segf(slot):
        k = slot // every
        return seg_factor[k] if k < len(seg_factor) else host

    def fallback(q, f1, f2):
        # pre-p1/p2 path: conservative (over-flags rather than hides)
        f = min(f1, f2)
        return (qn[q] / f if f > 0 else float("inf")), f

    rows = []
    for q in shared:
        i = names.index(q)
        f1, f2 = segf(i), segf(n + i)
        # v3 as stated: each pass normalized by its own segment; the
        # winning pass selected by index, not by float re-comparison
        cands = [(p / f, f) for p, f in ((p1.get(q, -1.0), f1),
                                         (p2.get(q, -1.0), f2))
                 if p >= 0 and f > 0]
        if cands:
            normed_now, f = min(cands)
        else:
            normed_now, f = fallback(q, f1, f2)
        norm = normed_now / qr[q] if qr[q] > 0 else float("inf")
        cont = (i // every) in contended or ((n + i) // every) in contended
        rows.append((norm, q, qn[q], qr[q], f, cont))
    rows.sort(reverse=True)
    has_tel = bool(spl[0] or spl[1] or gc[0] or gc[1])
    print(f"\ntop {top_n} normalized regressions "
          f"(norm = pass/segment_factor, min over passes, / ref):")
    print(f"{'query':32s} {'ref':>7s} {'now':>7s} {'seg_f':>6s} "
          f"{'norm':>6s}"
          + (f" {'spill p1/p2':>15s} {'gc_ms p1/p2':>12s}" if has_tel else "")
          + "  window?")

    def mb(b):
        return f"{b / 1048576:.0f}M" if b else "0"

    for norm, q, vn, vr, f, cont in rows[:top_n]:
        flag = "CONTENDED-SEGMENT" if cont else ""
        tel = ""
        if has_tel:
            tel = (f" {mb(spl[0].get(q, 0)) + '/' + mb(spl[1].get(q, 0)):>15s}"
                   f" {str(gc[0].get(q, 0)) + '/' + str(gc[1].get(q, 0)):>12s}")
        print(f"{q:32s} {vr:7.2f} {vn:7.2f} {f:6.2f} {norm:6.2f}{tel}  {flag}")

    # post-suite probes (Bench.PostProbes): same-JVM re-reads AFTER the
    # whole suite. post ~ in-suite ⇒ persistent JVM-state degradation;
    # post << in-suite ⇒ transient slot-local contention.
    post = now.get("post")
    if post:
        print("\npost-suite probes (in-suite best-of-2 vs post re-read):")
        for q, v in post.items():
            base = qn.get(q)
            # -1.0 is Bench's both-passes-failed sentinel, not a baseline
            ok = base is not None and base >= 0
            ratio = f"{v / base:5.2f}x" if ok else "in-suite failed"
            print(f"{q:32s} in-suite {base if ok else float('nan'):7.2f}"
                  f"  post {v:7.2f}  ({ratio})")


if __name__ == "__main__":
    main()
