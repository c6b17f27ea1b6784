#!/usr/bin/env python3
"""Scaling-coverage gate (r11 verdict item 5, mechanized in r12):
every catalog query must appear in SCALING.md — either as a measured
table row (certification table or a round addendum) or in the
explicit below-floor coverage list. A query added without committed
scaling evidence fails the round gate.

Dev-only tooling (not part of the shipped Scala library). Catalog
source of truth: scripts/qscan.py's full-text scan of the per-module
`queries` maps, cross-checked against the legacy line scan (fails
loudly on disagreement). The covered set is restricted to structural
positions — markdown table rows whose first cell is a q_ name, and
the comma-separated name list under the "Below-floor coverage"
heading — so a prose mention like "q_foo still lacks scaling data"
cannot satisfy the gate (r12 advice).

Usage: python3 scripts/scaling_gate.py   (exit 0 = covered, 1 = gaps)
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from qscan import ROOT, checked_catalog_queries


def covered_queries(text):
    covered = set()
    # Measured rows: "| q_name | ..." table rows anywhere in the file.
    for m in re.finditer(r"^\|\s*(q_[a-z0-9_]+)", text, re.M):
        covered.add(m.group(1))
    # Below-floor list: under its heading, only lines that are purely
    # a comma-separated run of q_ names (the list itself, not prose).
    sect = re.search(r"^## Below-floor coverage.*?(?=^## |\Z)", text,
                     re.M | re.S)
    if sect:
        for line in sect.group(0).splitlines():
            if re.fullmatch(r"\s*(q_[a-z0-9_]+\s*,?\s*)+", line):
                covered.update(re.findall(r"q_[a-z0-9_]+", line))
    return covered


def main():
    text = open(os.path.join(ROOT, "SCALING.md")).read()
    catalog = checked_catalog_queries()
    missing = sorted(catalog - covered_queries(text))
    if missing:
        print("SCALING GATE FAIL — catalog queries without a scaling "
              "table row or below-floor list entry in SCALING.md:")
        for q in missing:
            print(f"  {q}")
        print("Add a measured addendum row (scripts/scaling_run.sh) or "
              "a below-floor entry before closing the round.")
        return 1
    print(f"SCALING GATE PASS — all {len(catalog)} catalog "
          "queries covered in SCALING.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
