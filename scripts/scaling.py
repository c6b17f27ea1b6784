#!/usr/bin/env python3
"""Scaling certification: compare two Bench JSON lines (same queries,
different scale factors) and report the per-query scaling exponent
    alpha = log(t_big / t_small) / log(data_ratio)
computed on STEADY times (min-of-N, cold excluded: session bootstrap,
codegen and first-scan costs do not scale with data and would dilute
the signal). alpha <= 1 is linear-or-better; the flag threshold
corresponds to the round-9 gate "no query >3x its sf0.1 time per 10x
data" => alpha > log10(3) ~ 0.477 on a 10x ratio, modulo a fixed
per-query floor (streaming init, planning) that is subtracted via the
`--floor` option before the ratio.

Usage:
  scaling.py small.json big.json [--ratio 10] [--floor 0.15] [--gate 3.0]
"""
import json, math, sys


def load(path):
    with open(path) as f:
        line = [l for l in f if l.strip()][-1]
    return json.loads(line)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--"))
    ratio = float(opts.get("ratio", 10))
    floor = float(opts.get("floor", 0.15))
    gate = float(opts.get("gate", 3.0))
    small, big = load(args[0]), load(args[1])
    s, b = small["steady"], big["steady"]
    shared = sorted(set(s) & set(b))
    rows, flagged = [], []
    for q in shared:
        ts, tb = s[q], b[q]
        if ts is None or tb is None:
            rows.append((q, ts, tb, None, None, "FAILED"))
            flagged.append(q)
            continue
        es, eb = max(ts - floor, 1e-3), max(tb - floor, 1e-3)
        r = eb / es
        alpha = math.log(r) / math.log(ratio)
        flag = "SUPER" if r > gate and tb > 3 * floor + 0.2 else ""
        if flag:
            flagged.append(q)
        rows.append((q, ts, tb, r, alpha, flag))
    rows.sort(key=lambda x: -(x[3] or 1e9))
    print(f"| query | t_sf0.1 s | t_sf1 s | ratio | alpha | flag |")
    print(f"|---|---|---|---|---|---|")
    for q, ts, tb, r, a, fl in rows:
        if r is None:
            print(f"| {q} | {ts} | {tb} | - | - | {fl} |")
        else:
            print(f"| {q} | {ts:.2f} | {tb:.2f} | {r:.2f} | {a:.2f} | {fl} |")
    tot_s = sum(v for v in s.values() if v is not None and v in [s[q] for q in shared])
    tot_s = sum(s[q] for q in shared if s[q] is not None)
    tot_b = sum(b[q] for q in shared if b[q] is not None)
    print(f"\ncomposite steady: {tot_s:.1f}s -> {tot_b:.1f}s "
          f"(x{tot_b/max(tot_s,1e-9):.2f} at x{ratio:.0f} data)")
    print(f"flagged ({len(flagged)}): {', '.join(flagged) if flagged else 'none'}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
