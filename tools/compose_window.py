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

WINDOW_SIZE = 50


def last_checked_from_history(
    history: dict[int, dict[str, dict]],
) -> dict[str, int]:
    """Collapse per-round correctness rows to {name: latest green round}.

    Only hash-green rows count as "checked" — a red row means the query
    still needs a fresh slot, not a re-confirmation.
    """
    last: dict[str, int] = {}
    for rnd in sorted(history):
        for name, row in history[rnd].items():
            if row.get("hash_match"):
                last[name] = max(last.get(name, 0), rnd)
    return last


def compose(
    names: list[str],
    oracled: set[str],
    last_checked: dict[str, int],
    window_size: int = WINDOW_SIZE,
) -> tuple[list[str], list[str]]:
    """The window algorithm, pure and testable (VERDICT r7 item 6 —
    the re-confirmation pad path had never composed a real window, so
    its ordering is now locked by a unit test over synthetic history).

    Returns ``(window, never_checked)``: never-driver-checked oracled
    queries first in REGISTRATION order, then re-confirmation padding —
    driver-green queries ordered oldest-last-checked first, ties broken
    by registration order.
    """
    never = [n for n in names if n in oracled and n not in last_checked]
    pad = sorted(
        (n for n in names if n in oracled and n in last_checked),
        key=lambda n: (last_checked[n], names.index(n)),
    )
    window = (never + pad)[:window_size]
    if len(window) < window_size:
        raise ValueError(f"only {len(window)} oracled queries available")
    return window, never


def main() -> None:
    from image_matadata_batchprocessing_aws_spark import queries as Q

    history: dict[int, dict[str, dict]] = {}
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        history[rnd] = json.load(open(path))
    last_checked = last_checked_from_history(history)
    window, never = compose(
        list(Q.all_queries()), set(Q.all_oracles()), last_checked
    )
    print(
        f"# {len(never)} never-driver-checked, "
        f"{WINDOW_SIZE - min(len(never), WINDOW_SIZE)} re-confirmations "
        f"(oldest driver row first)"
    )
    print("_WINDOW = [")
    for n in window:
        tag = "" if n in last_checked else "  # never checked"
        print(f'    "{n}",{tag}')
    print("]")


if __name__ == "__main__":
    main()
