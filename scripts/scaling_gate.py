#!/usr/bin/env python3
"""Scaling-coverage gate (r11 verdict item 5, mechanized in r12):
every catalog query must appear in SCALING.md — either with a
measured sf0.1 -> sf1 row (certification table or a round addendum)
or in the explicit below-floor coverage list. A query added without
committed scaling evidence fails the round gate.

Dev-only tooling (not part of the shipped Scala library). Source of
truth for the catalog: the `"q_name" -> builder` entries in each
QueryModule's `queries` map (same scan as scripts/catalog.py).

Usage: python3 scripts/scaling_gate.py   (exit 0 = covered, 1 = gaps)
"""
import glob
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAIN = os.path.join(ROOT, "src/main/scala/graft")


def catalog_queries():
    names = set()
    for path in glob.glob(MAIN + "/**/*.scala", recursive=True):
        with open(path) as f:
            for line in f:
                m = re.search(r'"(q_[a-z0-9_]+)"\s*->\s*[A-Za-z0-9_.]+', line)
                if m and "oracles" not in line:
                    names.add(m.group(1))
    return names


def main():
    scaling = open(os.path.join(ROOT, "SCALING.md")).read()
    covered = set(re.findall(r"\b(q_[a-z0-9_]+)\b", scaling))
    missing = sorted(catalog_queries() - covered)
    if missing:
        print("SCALING GATE FAIL — catalog queries without a scaling "
              "row or below-floor entry in SCALING.md:")
        for q in missing:
            print(f"  {q}")
        print("Add a measured addendum row (scripts/scaling_run.sh) or "
              "a below-floor entry before closing the round.")
        return 1
    print(f"SCALING GATE PASS — all {len(catalog_queries())} catalog "
          "queries covered in SCALING.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
