#!/usr/bin/env python3
"""Shared catalog-query extractor for the gate scripts.

Source of truth: the `"q_name" -> value` entries across src/main.
Classification is by the first token after `->` in the FULL file text
(so multi-line map entries like `"q_x" ->\n  builder` are seen):
a string literal (quote or s-interpolator quote) marks an `oracles`
map entry (DuckDB SQL); anything else (identifier or lambda) marks a
`queries` map entry. The two per-module maps are the only places the
`"q_*" ->` shape appears.

A secondary line-based scan (the historical scaling_gate.py regex)
cross-checks the primary: if the two disagree on the query set beyond
the known multi-line entries, callers fail loudly instead of silently
under-enforcing.
"""
import glob
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAIN = os.path.join(ROOT, "src/main/scala/graft")

_ENTRY = re.compile(r'"(q_[a-z0-9_]+)"\s*->\s*(s?")?')

# `"q_x" -> value` where value may be a string literal or an identifier
_ENTRY_VAL = re.compile(r'"(q_[a-z0-9_]+)"\s*->\s*(s?"|[A-Za-z_][A-Za-z0-9_.]*)')

# `val foo: String = s"""...` / `val fooOracle =\n  s"..."` — identifiers
# whose value is a (possibly interpolated) string literal
_STRING_VAL = re.compile(
    r'(?:val|def)\s+([A-Za-z_][A-Za-z0-9_]*)\s*(?::\s*String)?\s*=\s*s?"')

# `def foo(args): String` — helper functions returning oracle SQL
_STRING_DEF = re.compile(
    r'def\s+([A-Za-z_][A-Za-z0-9_]*)\s*\([^)]*\)\s*:\s*String', re.S)


def catalog_queries():
    """All `queries`-map names (value is NOT a string literal)."""
    names = set()
    for path in glob.glob(MAIN + "/**/*.scala", recursive=True):
        with open(path) as f:
            text = f.read()
        for m in _ENTRY.finditer(text):
            if m.group(2) is None:  # not an oracle SQL string
                names.add(m.group(1))
    return names


def catalog_queries_lines():
    """Legacy single-line scan (misses multi-line entries) — used only
    as a cross-check that the primary scan is a superset."""
    names = set()
    for path in glob.glob(MAIN + "/**/*.scala", recursive=True):
        with open(path) as f:
            for line in f:
                m = re.search(r'"(q_[a-z0-9_]+)"\s*->\s*[A-Za-z0-9_.(]+',
                              line)
                if m and '"""' not in line and not re.search(
                        r'->\s*s?"', line):
                    names.add(m.group(1))
    return names


def oracle_queries():
    """All `oracles`-map names: entries whose value is a string literal
    OR an identifier defined as a string val anywhere in src/main (the
    r13-ADVICE gap — `"q_x" -> tumblingAppendOracle` style entries were
    invisible to a literal-only scan)."""
    texts = []
    for path in glob.glob(MAIN + "/**/*.scala", recursive=True):
        with open(path) as f:
            texts.append(f.read())
    string_vals = set()
    for text in texts:
        string_vals.update(_STRING_VAL.findall(text))
        string_vals.update(_STRING_DEF.findall(text))
    names = set()
    for text in texts:
        for m in _ENTRY_VAL.finditer(text):
            val = m.group(2)
            if val.endswith('"') or val.split(".")[-1] in string_vals:
                names.add(m.group(1))
    return names


def checked_catalog_queries():
    """Primary scan, validated against the legacy scan: the legacy
    line scan must be a subset (it can only miss multi-line entries,
    never find extras). Raises on disagreement."""
    full, lines = catalog_queries(), catalog_queries_lines()
    extra = lines - full
    if extra:
        raise RuntimeError(
            "catalog scans disagree — line scan found entries the "
            f"full-text scan missed: {sorted(extra)}")
    return full
