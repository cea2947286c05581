"""Time individual queries in isolation and capture their plans.

Usage::

    python tools/bench_one.py [--plans DIR] [--runs N] QUERY [QUERY ...]

For each named query: one warm-up noop-sink run, then ``--runs`` timed
noop-sink runs (min reported — the bench.py methodology), plus an
``explain("formatted")`` dump to ``--plans DIR/<query>.txt`` when asked.
Reads ``$SPARK_GRAFT_SF_DIR`` / ``$SPARK_GRAFT_CPUS`` exactly like
bench.py so numbers are comparable.  Guide §1.4 (noop sink) + §1.5
(labelled jobs).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_matadata_batchprocessing_aws_spark import get_spark
from image_matadata_batchprocessing_aws_spark.operators.caching import (
    release_persisted,
)
from image_matadata_batchprocessing_aws_spark.queries import all_queries


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--plans", default=None, help="dir for explain dumps")
    ap.add_argument("--suffix", default="", help="plan filename suffix, e.g. _before")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = all_queries()
    unknown = [n for n in args.queries if n not in qs]
    if unknown:
        import difflib

        for n in unknown:
            close = difflib.get_close_matches(n, qs, n=3)
            hint = f" (did you mean: {', '.join(close)}?)" if close else ""
            print(f"unknown query: {n}{hint}", file=sys.stderr)
        sys.exit(2)
    spark = get_spark(
        app_name="bench-one",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    for name in args.queries:
        fn = qs[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, sf_dir)
            # public API path (ADVICE r8): capture explain() output
            # instead of reaching into PythonSQLUtils internals
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            # elide embedded sketch/model literals (the dump_plans.py rule)
            plan = "\n".join(
                ln if len(ln) <= 400
                else ln[:200] + f" …<{len(ln) - 380} chars elided>… " + ln[-180:]
                for ln in plan.splitlines()
            )
            with open(
                os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
            release_persisted()
        spark.sparkContext.setJobDescription(f"warm:{name}")
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm = time.time() - t0
        release_persisted()
        best = float("inf")
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            release_persisted()
        print(f"{name}: min={best:.3f}s warm={warm:.3f}s", flush=True)


if __name__ == "__main__":
    main()
