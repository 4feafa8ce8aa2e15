#!/usr/bin/env python3
"""Unreferenced-public-API check (r19 verdict item 7, optional).

The bruteForcePairs episode took two rounds to close: a public def in
src/main with no caller anywhere is either dead weight or an untested
contract, and nothing in the build surfaces it. This check does, cheaply:

  - collect every public `def` declared in src/main/scala/graft
    (skipping `private`/`protected`/`override`, locals inside methods are
    approximated away by requiring 2-space indent, i.e. top-level members
    of a top-level object/class/trait);
  - flag any whose NAME appears nowhere else in src/ (main or test)
    outside its own declaration line.

Name-based, so deliberately conservative: a flagged name has ZERO other
textual occurrences repo-wide — not a heuristic "probably unused", a
certainty that no code, test, or registry calls it by name. Common names
(apply, of, main) naturally have many occurrences and never flag.

Exceptions (documented reasons, kept short on purpose):
  - `entry`, `queries`, `oracleSql`, `benchQueries`, `twinOf`, `main`:
    driver-contract entry points invoked reflectively by the harness.

Exit 1 with the flagged list if anything is found; exit 0 silently
otherwise. Part of the closing ritual (see ROUND_NOTES / memory).
"""

import os
import re
import sys
from collections import defaultdict

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
MAIN = os.path.join(ROOT, "src", "main", "scala", "graft")
SRC = os.path.join(ROOT, "src")

# driver-contract names the harness invokes reflectively
EXCEPTIONS = {"entry", "queries", "oracleSql", "benchQueries", "twinOf", "main"}

DEF_RE = re.compile(r"^(  |\t)(?:final |implicit |@\w+ )*def ([A-Za-z_][A-Za-z0-9_]*)")


def scala_files(base):
    for dirpath, _, files in os.walk(base):
        for f in files:
            if f.endswith(".scala"):
                yield os.path.join(dirpath, f)


def main():
    # declaration sites: (name -> [(file, lineno)]) for public top-level defs
    decls = defaultdict(list)
    for path in scala_files(MAIN):
        with open(path, encoding="utf-8") as fh:
            for i, line in enumerate(fh, 1):
                if re.match(r"^\s*(private|protected)\b", line):
                    continue
                if "override" in line.split("def")[0]:
                    continue
                m = DEF_RE.match(line)
                if m and m.group(2) not in EXCEPTIONS:
                    decls[m.group(2)].append((os.path.relpath(path, ROOT), i))

    # occurrence count of each name across ALL of src/, excluding the
    # declaration lines themselves
    flagged = []
    for name, sites in sorted(decls.items()):
        pattern = re.compile(r"\b" + re.escape(name) + r"\b")
        decl_keys = {(f, n) for f, n in sites}
        refs = 0
        for path in scala_files(SRC):
            rel = os.path.relpath(path, ROOT)
            with open(path, encoding="utf-8") as fh:
                for i, line in enumerate(fh, 1):
                    if (rel, i) in decl_keys:
                        continue
                    if pattern.search(line):
                        refs += 1
                        if refs > 0:
                            break
            if refs:
                break
        if not refs:
            flagged.append((name, sites))

    if flagged:
        print("UNREFERENCED public defs in src/main (no other occurrence in src/):")
        for name, sites in flagged:
            for f, n in sites:
                print(f"  {name}  ({f}:{n})")
        sys.exit(1)
    print(f"check_unreferenced: OK ({len(decls)} public defs, all referenced)")


if __name__ == "__main__":
    main()
