#!/usr/bin/env python3
"""Regenerate SURVEY.md §2z (query-name index) from the source tree.

Run from the repo root after adding/removing queries. Marks no-oracle
queries with ° using the latest oracle_sql.json dump if one is given:
    gen_query_index.py [path/to/oracle_sql.json]

Driver-side python — dev tooling only, NOT an engine dependency.
"""
import collections
import json
import re
import subprocess
import sys

HEADER = "### 2z. Query-name index (regenerated per round by scripts/gen_query_index.py)"
END = "## 3. Query lifecycle"


def main():
    files = subprocess.run(
        ["grep", "-rloE", '"q_[a-z0-9_]+"', "src/main/scala"],
        capture_output=True, text=True).stdout.split()
    loc = {}
    for f in files:
        txt = open(f).read()
        for m in re.finditer(r'Q(?:\.noOracle)?\(\s*\n?\s*"(q_[a-z0-9_]+)"',
                             txt):
            loc[m.group(1)] = f.replace("src/main/scala/", "")
    oracle = set()
    if len(sys.argv) > 1:
        oracle = set(json.load(open(sys.argv[1])))
    by_file = collections.defaultdict(list)
    for n, f in sorted(loc.items()):
        by_file[f].append(n)
    out = [HEADER, "",
           "Every driver-visible query, by defining catalog. Names marked °",
           "are no-oracle (rows-only check + ScalaTest stand-in); the rest "
           "are",
           "DuckDB-oracle hash-checked at sf0.01 and sf0.1.", ""]
    for f in sorted(by_file):
        names = ", ".join(
            n + ("" if n in oracle else "°") for n in by_file[f])
        out.append(f"- `{f}`: {names}")
    out.append("")
    s = open("SURVEY.md").read()
    start = s.index(HEADER)
    end = s.index(END)
    s = s[:start] + "\n".join(out) + "\n---\n\n" + s[end:]
    open("SURVEY.md", "w").write(s)
    print(f"indexed {len(loc)} queries "
          f"({len(loc) - len([n for n in loc if n in oracle])} no-oracle)"
          if oracle else f"indexed {len(loc)} queries (no oracle dump given)")


if __name__ == "__main__":
    main()
