#!/usr/bin/env python3
"""Per-query bench regression gate.

Compares two bench results and FAILS (exit 1) when any query regressed
more than THRESHOLD x — so a plan-level tradeoff that helps one family
but taxes another (like round 2's scan-spread change, q_distinct 13.6x)
cannot land unnoticed.

Usage:
    python3 scripts/bench_gate.py OLD.json NEW.json [threshold]

Accepts either the raw one-line JSON printed by graft.Bench or the
driver's BENCH_rN.json wrapper (JSON line embedded in a "tail" field).
A ratio only counts when the ABSOLUTE delta also clears FLOOR seconds:
sub-second queries jitter 2-3x between back-to-back idle runs (measured
r6: 0.21s -> 0.58s on an untouched single-aggregate query), so a pure
ratio gate at that scale trains readers to wave flags through — while
a genuine 2x regression of any query that matters loses whole seconds
and always clears the floor.
"""
import json
import re
import sys

FLOOR = 0.75  # seconds of absolute delta below which a ratio is noise


def load_bench(path):
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return doc
    # driver wrapper: the bench line is embedded in the "tail" text
    tail = doc.get("tail", "")
    truncated = False
    for line in reversed(tail.splitlines()):
        m = re.search(r"\{\"metric\":.*", line)
        if m:
            try:
                # raw_decode: accept trailing non-JSON text on the line
                # (capture suffixes) while still detecting truncation
                doc, _ = json.JSONDecoder().raw_decode(m.group(0))
                return doc
            except json.JSONDecodeError:
                truncated = True  # tail capture cut the end of the line
        elif re.search(r"\"(queries|steady|failed)\":", line):
            truncated = True  # head of the line cut off (r4's failure)
    hint = ("bench JSON line is TRUNCATED" if truncated
            else "no bench JSON line found")
    raise SystemExit(
        f"{path}: {hint}; use the durable copy graft.Bench writes to "
        f"target/bench.json instead")


def compare(old, new, threshold, n_samples=1):
    """Run the gate logic; returns the exit code (0 pass, 1 fail).

    n_samples is how many NEW samples were min-merged: the
    within-spread excusal is only trusted when >= 2, because a single
    contended sample plus a wide historical spread could green-light a
    real regression with no second opinion (r14 advisor). A flagged
    reading from one sample exits nonzero asking for a rerun instead
    of passing."""
    # Prefer steady-state numbers when both artifacts carry them (r5+):
    # cold numbers attribute shared one-time builds to whichever query
    # alphabetically-first consumes them, which is attribution, not
    # plan cost. Falls back to cold ("queries") against older artifacts.
    basis = "steady" if ("steady" in old and "steady" in new) else "queries"
    oq, nq = old[basis], new[basis]
    o_total = old.get("steady_total") if basis == "steady" else old["value"]
    n_total = new.get("steady_total") if basis == "steady" else new["value"]
    # Per-query noise spreads (r13 verdict item 4): when the baseline
    # records what pure window noise has ever done to a query
    # (min/med/max over every same-catalog campaign + driver sample,
    # contended windows included), a ratio-flagged reading that stays
    # AT OR UNDER the worst ever observed is window noise by
    # construction — report it, cite the spread, but don't fail. A
    # reading beyond anything ever seen fails as before.
    spreads = old.get("steady_spread", {}) if basis == "steady" else {}
    print(f"basis: {basis}" + (
        f" (spreads over {old.get('spread_samples', '?')} samples)"
        if spreads else ""))
    # a query that existed before but is absent now is lost COVERAGE,
    # not a pass — flag it before comparing the intersection
    missing = sorted(set(oq) - set(nq))
    for name in missing:
        print(f"  MISSING: {name} present in old bench but absent in new")
    failures, improved, within, resample = [], [], [], []
    for name in sorted(set(oq) & set(nq)):
        o, n = oq[name], nq[name]
        if o is None or n is None:  # failed query: reported elsewhere
            continue
        if abs(n - o) < FLOOR:  # absolute delta too small to be signal
            continue
        if o > 0 and n > o * threshold:
            sp = spreads.get(name)
            # Noise bound: the pool's p90 when the baseline records one
            # (r15+ mints); all-time max for older baselines. max/min
            # ratios reach 6x, so "worst ever seen" alone would excuse
            # 3-6x genuine regressions on the widest-spread queries.
            bound = sp.get("p90", sp["max"]) if sp else None
            if sp and n <= bound:
                if n_samples >= 2:
                    within.append((name, o, n, n / o, sp, bound))
                else:
                    resample.append((name, o, n, n / o, sp, bound))
            else:
                failures.append((name, o, n, n / o, sp))
        elif n > 0 and o > n * threshold:
            improved.append((name, o, n, o / n))

    new_failed = new.get("failed", 0)
    print(f"total: {o_total:.1f}s -> {n_total:.1f}s "
          f"({n_total / o_total:.2f}x), failed queries: {new_failed}")
    for name, o, n, x in sorted(improved, key=lambda t: -t[3]):
        print(f"  improved {x:5.1f}x  {o:7.2f}s -> {n:7.2f}s  {name}")
    for name, o, n, x, sp, bound in sorted(within, key=lambda t: -t[3]):
        print(f"  within-spread {x:4.1f}x  {o:7.2f}s -> {n:7.2f}s  {name} "
              f"(window noise: bound {bound:.2f}s, med {sp['med']:.2f}s "
              f"over {sp['n']} samples)")
    for name, o, n, x, sp, bound in sorted(resample, key=lambda t: -t[3]):
        print(f"  NEEDS RESAMPLE {x:4.1f}x  {o:7.2f}s -> {n:7.2f}s  {name} "
              f"(within spread bound {bound:.2f}s, but only 1 new sample — "
              f"rerun with 2+ samples, comma-separated)")
    for name, o, n, x, sp in sorted(failures, key=lambda t: -t[3]):
        cite = (f" (beyond noise bound {sp.get('p90', sp['max']):.2f}s "
                f"over {sp['n']} samples)" if sp else "")
        print(f"  REGRESSED {x:4.1f}x  {o:7.2f}s -> {n:7.2f}s  {name}{cite}")

    if failures or new_failed or missing or resample:
        print(f"GATE FAIL: {len(failures)} quer{'y' if len(failures) == 1 else 'ies'} "
              f"regressed >{threshold}x, {new_failed} failed, {len(missing)} missing"
              + (f", {len(resample)} flagged on a single sample — rerun with "
                 f"2+ samples" if resample else ""))
        return 1
    print("GATE PASS")
    return 0


def selftest():
    """Synthetic-regression self-test of the spread logic: a 4x reading
    within the recorded spread passes when min-merged over 2+ samples
    (window noise); the same reading on a SINGLE sample demands a
    rerun; a reading beyond the spread fails; the noise bound is p90
    when recorded (r15+), max for legacy baselines; a query with no
    spread keeps the old strict behavior."""
    base = {
        "steady": {"q_loop": 2.0, "q_flat": 3.0},
        "steady_total": 5.0,
        "steady_spread": {
            "q_loop": {"min": 2.0, "med": 2.5, "max": 9.0, "n": 10},
            "q_flat": {"min": 3.0, "med": 3.1, "max": 3.6, "n": 10},
        },
        "spread_samples": 10,
    }
    noisy = {"steady": {"q_loop": 8.0, "q_flat": 3.2}, "steady_total": 11.2}
    regressed = {"steady": {"q_loop": 9.5, "q_flat": 3.2}, "steady_total": 12.7}
    legacy_base = {"steady": base["steady"], "steady_total": 5.0}
    # p90-aware baseline: same max, but p90 says routine noise tops out
    # at 6.0s — the 8.0s reading that the max would excuse now fails.
    p90_base = json.loads(json.dumps(base))
    p90_base["steady_spread"]["q_loop"]["p90"] = 6.0
    checks = [
        ("within-spread 4x passes (2 samples)",
         compare(base, noisy, 2.0, n_samples=2), 0),
        ("within-spread on 1 sample demands rerun",
         compare(base, noisy, 2.0, n_samples=1), 1),
        ("beyond-spread 4.75x fails",
         compare(base, regressed, 2.0, n_samples=2), 1),
        ("no-spread baseline stays strict",
         compare(legacy_base, noisy, 2.0, n_samples=2), 1),
        ("p90 bound beats all-time max",
         compare(p90_base, noisy, 2.0, n_samples=2), 1),
    ]
    bad = [(lbl, got, want) for lbl, got, want in checks if got != want]
    for lbl, got, want in bad:
        print(f"SELFTEST FAIL: {lbl}: exit {got}, wanted {want}")
    if bad:
        sys.exit(1)
    print(f"SELFTEST PASS ({len(checks)} checks)")


def min_merge(docs):
    """Min-per-query across samples — the committed estimator on this
    box (BASELINE.md: single samples spread up to 2x; compare
    min-over-runs only). NEW may be given as comma-separated sample
    paths; a spike present in one sample but absent in another is
    window noise by the same rule the baseline itself was minted by."""
    if len(docs) == 1:
        return docs[0]
    out = dict(docs[0])
    for field in ("queries", "steady"):
        merged = {}
        for d in docs:
            for k, v in d.get(field, {}).items():
                if v is not None and (k not in merged or v < merged[k]):
                    merged[k] = v
        out[field] = merged
    out["value"] = sum(out["queries"].values())
    out["steady_total"] = sum(out["steady"].values())
    out["failed"] = max(d.get("failed", 0) for d in docs)
    return out


def main():
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        return selftest()
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old = load_bench(sys.argv[1])
    news = [load_bench(p) for p in sys.argv[2].split(",")]
    if len(news) > 1:
        print(f"min-per-query over {len(news)} new samples")
    new = min_merge(news)
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    sys.exit(compare(old, new, threshold, n_samples=len(news)))


if __name__ == "__main__":
    main()
