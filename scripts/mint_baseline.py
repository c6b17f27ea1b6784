#!/usr/bin/env python3
"""Mint a per-query bench baseline from N sample JSONs.

Takes the min per query over all samples for BOTH the cold and steady
maps (min-per-query is the committed estimator on this box — single
runs spread 2-4x under host noise), refuses samples whose query sets
disagree (a catalog change invalidates old samples), and writes the
baseline file `scripts/round_gate.sh` compares against.

Usage:
  python3 scripts/mint_baseline.py OUT.json "provenance text" sample1.json [sample2.json ...]
"""
import json
import sys


def main():
    out, prov, paths = sys.argv[1], sys.argv[2], sys.argv[3:]
    if not paths:
        sys.exit("need at least one sample json")
    samples = []
    for p in paths:
        with open(p) as f:
            samples.append(json.load(f))
    keys = set(samples[0]["queries"])
    for p, s in zip(paths, samples):
        if set(s["queries"]) != keys:
            sys.exit(f"{p}: query set differs from {paths[0]} — "
                     "stale sample for this catalog")
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
    doc = {
        "metric": "total",
        "value": sum(cold.values()),
        "unit": "sec",
        "queries": cold,
        "steady": steady,
        "steady_total": sum(steady.values()),
        "steady_runs": samples[0].get("steady_runs", 3),
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
