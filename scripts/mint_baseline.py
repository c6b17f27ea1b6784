#!/usr/bin/env python3
"""Mint a per-query bench baseline from N sample JSONs.

Takes the min per query over all samples for BOTH the cold and steady
maps (min-per-query is the committed estimator on this box — single
runs spread 2-4x under host noise), refuses samples whose query sets
disagree (a catalog change invalidates old samples), and writes the
baseline file `scripts/round_gate.sh` compares against.

With --history=bench_history.jsonl, also records a per-query noise
SPREAD (min/med/max/n of steady seconds) over every history entry
with the SAME query set — including contended-window runs — so the
gate can mechanically distinguish "loop query in a loadavg-10 window"
(within the recorded spread) from a plan regression (beyond anything
ever observed). The min-per-query baseline itself still comes only
from the explicitly passed (quiet-campaign) samples.

Usage:
  python3 scripts/mint_baseline.py OUT.json "provenance text" \
      [--history=bench_history.jsonl] sample1.json [sample2.json ...]
"""
import json
import sys


def main():
    args = sys.argv[1:]
    history = None
    for a in list(args):
        if a.startswith("--history="):
            history = a.split("=", 1)[1]
            args.remove(a)
    if len(args) < 3:
        sys.exit("need OUT.json, provenance, and at least one sample json")
    out, prov, paths = args[0], args[1], args[2:]
    samples = []
    for p in paths:
        with open(p) as f:
            samples.append(json.load(f))
    keys = set(samples[0]["queries"])
    sf = samples[0].get("sf", "")
    for p, s in zip(paths, samples):
        if set(s["queries"]) != keys:
            sys.exit(f"{p}: query set differs from {paths[0]} — "
                     "stale sample for this catalog")
        if s.get("sf", "") != sf:
            sys.exit(f"{p}: sf {s.get('sf', '')!r} differs from "
                     f"{paths[0]}'s {sf!r} — mixed-scale samples")
        if s.get("failed", 0):
            sys.exit(f"{p}: has failed queries — not baseline material")

    def mins(field):
        m = {}
        for s in samples:
            for k, v in s[field].items():
                if v is not None and (k not in m or v < m[k]):
                    m[k] = v
        return dict(sorted(m.items()))

    cold, steady = mins("queries"), mins("steady")

    # spread pool: the passed samples plus every same-query-set history
    # entry (contended windows included — that's the point: the spread
    # records what pure window noise has ever done to each query)
    # Pool membership requires the same query set AND the same sf: a
    # same-catalog entry at a different scale factor is a different
    # workload and would poison the noise model (found by the r14
    # advisor — history held one sf0.01 entry). The gate's noise bound
    # is the pool's p90, not the all-time max: recorded max/min ratios
    # reach 6x, so bounding at "worst ever observed" would excuse 3-6x
    # genuine regressions; p90 still absorbs the routine window spikes
    # (which are single-sample events in a 20+-entry pool) while a
    # reverted optimization lands beyond it.
    pool = list(samples)
    if history:
        with open(history) as f:
            for line in f:
                e = json.loads(line)
                if (set(e.get("steady", {})) == keys
                        and e.get("sf", "") == sf
                        and not e.get("failed", 0)):
                    pool.append(e)
    spread = {}
    for k in sorted(keys):
        vals = sorted(s["steady"][k] for s in pool
                      if s["steady"].get(k) is not None)
        if vals:
            spread[k] = {"min": vals[0], "med": vals[len(vals) // 2],
                         "p90": vals[min(len(vals) - 1,
                                         int(0.9 * (len(vals) - 1) + 0.999))],
                         "max": vals[-1], "n": len(vals)}

    doc = {
        "metric": "total",
        "value": sum(cold.values()),
        "unit": "sec",
        "queries": cold,
        "steady": steady,
        "steady_total": sum(steady.values()),
        "steady_runs": samples[0].get("steady_runs", 3),
        "steady_spread": spread,
        "spread_samples": len(pool),
        "failed": 0,
        "provenance": prov,
        "sf": samples[0].get("sf", ""),
    }
    with open(out, "w") as f:
        json.dump(doc, f)
        f.write("\n")
    stream = sum(v for k, v in steady.items() if k.startswith("q_stream_"))
    print(f"{out}: {len(cold)} queries, cold {doc['value']:.1f}s, "
          f"steady {doc['steady_total']:.1f}s (stream {stream:.1f}s), "
          f"{len(samples)} samples")


if __name__ == "__main__":
    main()
