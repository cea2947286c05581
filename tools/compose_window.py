"""Propose the next round's correctness window.

Reads every CORRECTNESS_r*.json plus the current registry and prints a
ready-to-paste `_WINDOW` body: oracled queries with NO driver row yet
first (these must get rows), then re-confirmation padding chosen from
driver-green queries, oldest-last-checked first — so every oracled query
keeps getting periodic fresh rows on regenerated testdata.

Usage: python tools/compose_window.py
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")

from image_matadata_batchprocessing_aws_spark import queries as Q  # noqa: E402

WINDOW_SIZE = 50


def main() -> None:
    names = list(Q.all_queries())
    oracles = set(Q.all_oracles())
    last_checked: dict[str, int] = {}
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        for name, row in json.load(open(path)).items():
            if row.get("hash_match"):
                last_checked[name] = max(last_checked.get(name, 0), rnd)
    never = [n for n in names if n in oracles and n not in last_checked]
    pad = sorted(
        (n for n in names if n in oracles and n in last_checked),
        key=lambda n: (last_checked[n], names.index(n)),
    )
    window = (never + pad)[:WINDOW_SIZE]
    if len(window) < WINDOW_SIZE:
        raise SystemExit(f"only {len(window)} oracled queries available")
    print(f"# {len(never)} never-driver-checked, "
          f"{WINDOW_SIZE - min(len(never), WINDOW_SIZE)} re-confirmations "
          f"(oldest driver row first)")
    print("_WINDOW = [")
    for n in window:
        tag = "" if n in last_checked else "  # never checked"
        print(f'    "{n}",{tag}')
    print("]")


if __name__ == "__main__":
    main()
