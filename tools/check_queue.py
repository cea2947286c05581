"""Run r05-queue (query, oracle) pairs through the exact compare the
driver applies to the registered inventory, at any sf dir.

    python tools/check_queue.py [sf_dir] [name ...]

Defaults to sf0.01 (the driver's correctness scale) — the pytest
harness covers sf0.001, so a green run here gives queue entries the
same two-scale confidence the registered inventory has.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_matadata_batchprocessing_aws_spark.queries import r05_queue
from image_matadata_batchprocessing_aws_spark.schemas import DRIVER_TABLES
from tools.check_oracle import normalize


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from image_matadata_batchprocessing_aws_spark.session import get_spark
    from image_matadata_batchprocessing_aws_spark.operators.caching import (
        release_persisted,
    )

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    failures = []
    for name, fn in r05_queue.QUERIES.items():
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
            release_persisted()
        try:
            rel = con.sql(r05_queue.ORACLES[name])
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
            bad = sum(1 for a, b in zip(sn, dn) if a != b)
            first = next(((a, b) for a, b in zip(sn, dn) if a != b), None)
            status.append(
                f"{bad} differing rows; first: spark={first[0]} duckdb={first[1]}"
            )
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures.append(name)
        else:
            print(f"ok   {name}: {len(sn)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
