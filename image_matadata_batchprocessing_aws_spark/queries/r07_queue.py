"""Oracle-ready queries staged during r06 for r07 registration.

Same discipline as ``queries/r06_queue.py`` was under in r05: the
registry drains 50 driver slots per round, so new queries stage here —
fully oracled and exact-verified (``tests/test_r07_queue.py`` at
sf0.001, ``tools/check_oracle.py --staged`` at any sf dir) — and
register only when the never-driver-checked backlog allows (the r03
lesson: keep registry growth <= window drain rate).  Capped at <= 50
pairs per the drain plan in ``queries/__init__.py``.

Float-parity rules are the house ones (see ``queries/etl.py``).
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
