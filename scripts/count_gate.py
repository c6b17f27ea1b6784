#!/usr/bin/env python3
"""Catalog-count staleness gate (r12 verdict item 4: a stale hardcoded
query count has slipped into the docs three rounds running).

Checks the places that state the CURRENT catalog total against the
actual `queries`-map count from scripts/qscan.py:
  - CATALOG.md's "**N queries.**" headline
  - COVERAGE.md's "Totals: **N oracle-checked queries" line
  - README.md must not hardcode any "N named queries" figure at all
    (it now points at CATALOG.md instead).
Historical counts in BASELINE.md / NOTES provenance are deliberately
out of scope — they describe past campaigns, not the current catalog.

Usage: python3 scripts/count_gate.py   (exit 0 = consistent)
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from qscan import ROOT, checked_catalog_queries, oracle_queries


def main():
    n = len(checked_catalog_queries())
    errs = []

    cat = open(os.path.join(ROOT, "CATALOG.md")).read()
    m = re.search(r"\*\*(\d+) queries\.\*\*", cat)
    if not m:
        errs.append("CATALOG.md: missing '**N queries.**' headline")
    elif int(m.group(1)) != n:
        errs.append(f"CATALOG.md says {m.group(1)} queries, catalog has {n}"
                    " — regenerate with scripts/catalog.py")

    cov = open(os.path.join(ROOT, "COVERAGE.md")).read()
    m = re.search(r"Totals: \*\*(\d+) oracle-checked queries", cov)
    if not m:
        errs.append("COVERAGE.md: missing 'Totals: **N oracle-checked"
                    " queries' line")
    elif int(m.group(1)) != n:
        errs.append(f"COVERAGE.md totals say {m.group(1)}, catalog has {n}")

    # r13 ADVICE: diff CATALOG.md's per-row oracle column against the
    # oracles maps — the headline count alone let a regenerated table
    # with 54 wrongly-'—' rows pass the gate.
    oracles = oracle_queries()
    for row in re.finditer(
            r"^\| `(q_[a-z0-9_]+)` \| [^|]+ \| [^|]+ \| ([^|]+) \|", cat,
            re.M):
        name, col = row.group(1), row.group(2).strip()
        if name in oracles and col != "yes":
            errs.append(f"CATALOG.md: {name} has a DuckDB oracle but the"
                        f" oracle column says '{col}'")
        elif name not in oracles and col == "yes":
            errs.append(f"CATALOG.md: {name} says oracle 'yes' but no"
                        " oracles-map entry was found")

    readme = open(os.path.join(ROOT, "README.md")).read()
    for m in re.finditer(r"(\d+)\s+named quer", readme):
        errs.append(f"README.md hardcodes '{m.group(0)}' — point at"
                    " CATALOG.md instead")

    if errs:
        print("COUNT GATE FAIL:")
        for e in errs:
            print(f"  {e}")
        return 1
    print(f"COUNT GATE PASS — docs agree with the {n}-query catalog")
    return 0


if __name__ == "__main__":
    sys.exit(main())
