"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, sorted column
names, and order-insensitive values.  Floats compare EXACTLY (bitwise,
including the -0.0/+0.0 distinction) because the driver's value hash is
exact — round-1's etl_zscore failed the driver while passing a tolerant
local check, so tolerance here is a footgun, not a feature.

Usage: python tools/check_oracle.py [--staged] [sf_dir] [query ...]

``--staged`` checks every unregistered staging queue
(queries/r08_queue.py, r09_queue.py — currently 100 pairs) instead of
the registered inventory — one gate covers the whole staging surface
(tools/check_queue.py was retired when the r05 queue registered).
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from image_matadata_batchprocessing_aws_spark import get_spark  # noqa: E402
from image_matadata_batchprocessing_aws_spark.schemas import DRIVER_TABLES  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    # exact: repr distinguishes -0.0 from 0.0 and 1-ulp diffs
                    vals.append(repr(v))
            else:
                vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return [columns[i] for i in order], out


def main():
    argv = [a for a in sys.argv[1:] if a != "--staged"]
    staged = "--staged" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    import os

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    from image_matadata_batchprocessing_aws_spark.operators.caching import release_persisted

    if staged:
        # --staged covers EVERY unregistered queue module (one gate for
        # the whole staging surface; r07_queue registered in r09, so
        # the live staging surface is r08_queue (registers r10) +
        # r09_queue (registers r11) per the drain plan)
        from image_matadata_batchprocessing_aws_spark.queries import (
            r08_queue,
            r09_queue,
        )

        qs: dict = {}
        oracles: dict = {}
        for mod in (r08_queue, r09_queue):
            overlap = set(qs) & set(mod.QUERIES)
            if overlap:
                raise SystemExit(f"staged-queue name collision: {overlap}")
            qs.update(mod.QUERIES)
            oracles.update(mod.ORACLES)
    else:
        qs = entrymod.queries()
        oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            continue
        finally:
            # drop operator-persisted intermediates so a 208-query
            # session doesn't accumulate cached blocks (ADVICE r3)
            release_persisted()
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            drows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        sc, sn = normalize(srows, scols)
        dc, dn = normalize(drows, dcols)
        status = []
        if sc != dc:
            status.append(f"columns {sc} != {dc}")
        if len(sn) != len(dn):
            status.append(f"rowcount {len(sn)} != {len(dn)}")
        if not status and sn != dn:
            # find first mismatch for diagnosis
            bad = sum(1 for a, b in zip(sn, dn) if a != b)
            first = next(((a, b) for a, b in zip(sn, dn) if a != b), None)
            status.append(f"{bad} differing rows; first: spark={first[0]} duckdb={first[1]}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures.append(name)
        else:
            print(f"ok   {name}: {len(sn)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
