"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql()
are aligned, every query runs at sf0.001 and returns a stable schema."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 4


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
)
def test_entry_chain_oracle_exact_at_sf001(spark, monkeypatch, sf_dir):
    # VERDICT r4 item 8 (+ the r05 sf0.1 stretch): the flagship ETL
    # chain only ever ran at sf0.001 (driver smoke).  Exercise it at
    # sf0.01 AND sf0.1 and check the full result against a DuckDB
    # recomputation of the chain (an oracle, not a pinned literal — the
    # driver regenerates the parquet between rounds), so plan-shape
    # regressions in the one query the driver always runs get caught at
    # scales where window/ffill partitioning actually matters.
    import duckdb

    monkeypatch.setattr(entrymod, "SF_SMOKE", sf_dir)
    df = entrymod.entry(spark)
    from tools.check_oracle import normalize

    scols, srows = normalize([tuple(r) for r in df.collect()], df.columns)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    res = con.execute(
        """
        WITH base AS (
            SELECT *, epoch_ms(ts) AS ts_ms,
                   CASE WHEN event_type <> 'error'
                        THEN CAST(round(value * 100.0) AS BIGINT) END AS v0
            FROM events),
        filled AS (
            SELECT *, coalesce(
                v0,
                last_value(v0 IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                first_value(v0 IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
                0) AS v,
                make_timestamp(ts_ms * 1000) AS ts2
            FROM base)
        SELECT event_type,
               CAST(year(ts2) AS INT) AS year,
               CAST(month(ts2) AS INT) AS month,
               CAST(day(ts2) AS INT) AS day,
               count(*) AS n_events,
               round(CAST(sum(v) AS DOUBLE) / 100.0, 2) AS sum_value,
               round(CAST(sum(v) AS DOUBLE)
                     / (100.0 * CAST(count(*) AS DOUBLE)), 4) AS avg_value,
               count(DISTINCT user_id) AS n_users
        FROM filled
        GROUP BY 1, 2, 3, 4
        """
    )
    ocols, orows = normalize(res.fetchall(), [d[0] for d in res.description])
    assert len(srows) == len(orows) and len(srows) > 0
    assert [c.lower() for c in scols] == [c.lower() for c in ocols]
    assert srows == orows


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # rows-only ops are the documented exceptions
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "agg_approx_distinct",  # HLL estimate — approx by definition
        "embedding_semdedup",  # iterative k-means inside — rows-only
    }


def test_all_queries_run_at_smoke_sf(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.columns, name
        df.limit(1).collect()  # plan executes


def test_register_views_enables_plain_sql(spark):
    from image_matadata_batchprocessing_aws_spark.sources.tables import register_views

    names = register_views(spark, "/root/testdata/sf0.001")
    assert "lineitem" in names and "events" in names
    n = spark.sql("SELECT count(*) AS n FROM documents").collect()[0].n
    assert n > 0
    # events ts normalization rides along: unix_millis works through SQL
    r = spark.sql("SELECT max(unix_millis(ts)) AS m FROM events").collect()[0].m
    assert r > 0


def test_register_views_skips_missing_tables(spark, tmp_path):
    # ADVICE r3: a partially-populated sf_dir must skip absent tables,
    # not raise on the first missing parquet
    from image_matadata_batchprocessing_aws_spark.sources.tables import register_views

    src = "/root/testdata/sf0.001/region.parquet"
    import shutil

    shutil.copy(src, tmp_path / "region.parquet")
    names = register_views(spark, str(tmp_path), suffix="_partial")
    assert names == ["region_partial"]
    assert spark.sql("SELECT count(*) AS n FROM region_partial").collect()[0].n == 5


def test_parity_doc_tally_matches_registry():
    # VERDICT r3 item 3: PARITY.md's tally drifted from the registry
    # once (205/200 vs 208/203); lock the doc to the code
    import re

    doc = open("/root/repo/PARITY.md").read()
    m = re.search(r"Total queries: (\d+)\. Exact DuckDB oracles: (\d+)", doc)
    assert m, "PARITY.md registry-tally paragraph missing"
    assert int(m.group(1)) == len(entrymod.queries())
    assert int(m.group(2)) == len(entrymod.oracle_sql())
    # README quotes the same tally — lock it too (it drifted in r04)
    readme = open("/root/repo/README.md").read()
    m2 = re.search(r"\((\d+) entries, (\d+) with exact DuckDB oracles", readme)
    assert m2, "README.md registry-tally sentence missing"
    assert int(m2.group(1)) == len(entrymod.queries())
    assert int(m2.group(2)) == len(entrymod.oracle_sql())
    # the r05 queue tally is quoted in PARITY.md too — lock it as well
    from image_matadata_batchprocessing_aws_spark.queries import r05_queue

    m3 = re.search(r"registration queue itself: (\d+)\s+\(query, oracle\) pairs", doc)
    assert m3, "PARITY.md queue-tally sentence missing"
    assert int(m3.group(1)) == len(r05_queue.QUERIES)
    # and the r06 staging-queue tally (added r05)
    from image_matadata_batchprocessing_aws_spark.queries import r06_queue

    m4 = re.search(
        r"r06 staging queue holds (\d+)\s+\(query, oracle\) pairs", doc
    )
    assert m4, "PARITY.md r06-queue tally sentence missing"
    assert int(m4.group(1)) == len(r06_queue.QUERIES)
    # and the r08 staging-queue tally (added r07)
    from image_matadata_batchprocessing_aws_spark.queries import r08_queue

    m5 = re.search(
        r"r08 staging queue holds (\d+)\s+\(query, oracle\) pairs", doc
    )
    assert m5, "PARITY.md r08-queue tally sentence missing"
    assert int(m5.group(1)) == len(r08_queue.QUERIES)
    # and the r09 staging-queue tally (added r08)
    from image_matadata_batchprocessing_aws_spark.queries import r09_queue

    m6 = re.search(
        r"r09 staging queue holds (\d+)\s+\(query, oracle\) pairs", doc
    )
    assert m6, "PARITY.md r09-queue tally sentence missing"
    assert int(m6.group(1)) == len(r09_queue.QUERIES)


def test_window_plan_comment_matches_code():
    # VERDICT r4 item 6: the in-code window-plan comment drifted in r04
    # ("frozen at 208 / 17 backlog" vs actual 210 / 20+2).  Lock the
    # r09 comment's arithmetic to the code and the recorded driver
    # artifacts so it can't drift silently again.
    import json
    import re

    from image_matadata_batchprocessing_aws_spark import queries as qpkg
    from image_matadata_batchprocessing_aws_spark.queries import r06_queue, r07_queue

    reg = qpkg.all_queries()
    oracles = qpkg.all_oracles()
    window = qpkg._WINDOW
    src = open(qpkg.__file__).read()

    # comment claims "grows to 451" and "437/451"
    m = re.search(r"registry grows to (\d+) this round", src)
    assert m and int(m.group(1)) == len(reg)
    m = re.search(r"union to (\d+)/(\d+) if all\n?#?:? ?50 land green", src)
    assert m and int(m.group(2)) == len(reg)
    # 387 strict green union recorded over r01-r08 + 50 window slots = 437
    union_green = set()
    checked = set()
    for r in (1, 2, 3, 4, 5, 6, 7, 8):
        rows = json.load(open(f"/root/repo/CORRECTNESS_r0{r}.json"))
        checked |= set(rows)
        for k, v in rows.items():
            if (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match") in (True, None)
            ):
                union_green.add(k)
    union_green &= set(reg)
    assert int(m.group(1)) == len(union_green | set(window))
    m = re.search(r"union\n#: after r08 = (\d+)/(\d+)", src)
    assert m and int(m.group(1)) == len(union_green)
    assert int(m.group(2)) == len(reg)
    # every window entry is oracled, and none already has a green row
    assert set(window) <= set(oracles)
    assert not set(window) & union_green
    # the window leads with every ever-checked-never-green oracled
    # query (r09: none — zero ever-checked-never-green after r08)
    never_green_checked = (checked & set(oracles)) - union_green
    assert never_green_checked <= set(window)
    # the 50 slots = ALL 12 remaining never-checked r06-queue entries
    # (registration order) + the first 38 never-checked r07-queue
    # entries — exactly what tools/compose_window.py emits
    never_checked_q6 = [n for n in r06_queue.QUERIES if n not in checked]
    never_checked_q7 = [n for n in r07_queue.QUERIES if n not in checked]
    assert list(window) == never_checked_q6 + never_checked_q7[: 50 - len(
        never_checked_q6
    )]
    assert len(never_checked_q6) == 12
    # drain arithmetic: "0 r06-queue entries plus the 12 r07-queue
    # entries remain never-driver-checked" after this window lands
    m = re.search(
        r"(\d+) r06-queue entries plus the (\d+) r07-queue\n#: entries remain",
        src,
    )
    assert m, "drain-plan sentence missing"
    assert int(m.group(1)) == 0
    assert int(m.group(2)) == len(never_checked_q7) - (50 - len(never_checked_q6))
    # r07 queue is REGISTERED (appended at the registry end); r08/r09
    # queues are NOT yet (they register r10/r11 per the comment)
    assert set(r07_queue.QUERIES) <= set(reg)
    from image_matadata_batchprocessing_aws_spark.queries import r08_queue, r09_queue

    assert not set(r08_queue.QUERIES) & set(reg)
    assert not set(r09_queue.QUERIES) & set(reg)
    # endgame arithmetic: every staged queue has a scheduled
    # registration round — r10 registers r08_queue, r11 registers
    # r09_queue.  The comment's registry sizes must tile from the
    # actual queue lengths.
    m = re.search(r"r10 registers ``r08_queue\.py``\n#: \((\d+) -> (\d+)\)", src)
    assert m and int(m.group(1)) == len(reg)
    assert int(m.group(2)) == len(reg) + len(r08_queue.QUERIES)
    m = re.search(r"r11 registers ``r09_queue\.py`` \((\d+) -> (\d+)\)", src)
    assert m and int(m.group(1)) == len(reg) + len(r08_queue.QUERIES)
    assert int(m.group(2)) == len(reg) + len(r08_queue.QUERIES) + len(
        r09_queue.QUERIES
    )
    # leftover after this window = 12 r07 + 50 r08-staged + 50
    # r09-staged = exactly two-and-a-half more 50-windows of drain
    leftover = len(never_checked_q7) - (50 - len(never_checked_q6))
    assert leftover == 12


def test_track_persist_release(spark):
    from image_matadata_batchprocessing_aws_spark.operators.caching import (
        release_persisted,
        track_persist,
    )

    df = track_persist(spark.range(10))
    df.count()
    assert df.storageLevel.useMemory
    assert release_persisted() >= 1
    assert not df.storageLevel.useMemory


@pytest.mark.parametrize(
    "name",
    ["pipeline_web_corpus", "pipeline_curation_funnel", "pipeline_entity_resolution"],
)
def test_flagship_compositions_oracle_exact_at_sf01(spark, name):
    # VERDICT r5 item 8 (second entry()-grade pin): the flagship
    # compositions that actually READ the sf tables run oracle-exact at
    # sf0.1 — ten times the driver's check scale — so plan-shape
    # regressions in the highest-LoC paths get caught where dedup
    # banding / window partitioning sizes actually matter.  (The
    # multimodal/image/audio/triplet flagships build synthetic inputs —
    # their closed-form oracles are scale-invariant, so the registered
    # sf0.001/sf0.01 checks already pin them fully.)
    import duckdb

    from image_matadata_batchprocessing_aws_spark.schemas import DRIVER_TABLES
    from tools.check_oracle import normalize

    sf_dir = "/root/testdata/sf0.1"
    qs = entrymod.queries()
    con = duckdb.connect()
    for tbl in DRIVER_TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'"
        )
    sdf = qs[name](spark, sf_dir)
    scols, srows = normalize([tuple(r) for r in sdf.collect()], sdf.columns)
    res = con.execute(entrymod.oracle_sql()[name])
    ocols, orows = normalize(res.fetchall(), [d[0] for d in res.description])
    assert scols == ocols, (scols, ocols)
    assert len(srows) == len(orows)
    assert srows == orows


def test_bench_headline_integrity():
    """bench.py's HEADLINE must stay duplicate-free, resolvable in the
    registry, and append-only over the frozen r02 prefix — the
    round-over-round comparability contract (drift here would silently
    break the like-for-like frozen-30 totals)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
    reg = set(entrymod.queries())
    missing = [n for n in bench.HEADLINE if n not in reg]
    assert not missing, missing
    assert bench.FROZEN_PREFIX == bench.HEADLINE[:30]
    # the frozen r02 prefix itself (never reorder, never remove)
    assert bench.FROZEN_PREFIX[:4] == [
        "etl_sentinel_ffill",
        "etl_label_encode",
        "etl_zscore",
        "etl_batch_id",
    ]
    assert len(bench.FROZEN_PREFIX) == 30


def test_compose_window_pad_ordering():
    """VERDICT r7 item 6: the r10+ windows are mostly re-confirmation
    padding, a compose_window.py path that has never produced a real
    window.  Lock its ordering on synthetic history: never-checked
    first (registration order), then driver-green padding oldest
    last-checked first, registration order breaking ties; red rows do
    NOT count as checked; truncation at the window size."""
    from tools.compose_window import compose, last_checked_from_history

    names = [f"q{i:02d}" for i in range(10)]
    oracled = set(names) - {"q07"}  # q07 is rows-only: never in windows
    history = {
        1: {
            "q03": {"hash_match": True},
            "q05": {"hash_match": True},
            "q08": {"hash_match": False},  # red: still "never checked"
        },
        2: {
            "q03": {"hash_match": True},  # re-green: last_checked -> 2
            "q00": {"hash_match": True},
            "q09": {"hash_match": True},
        },
        3: {
            "q09": {"hash_match": True},  # last_checked -> 3
        },
    }
    last = last_checked_from_history(history)
    assert last == {"q03": 2, "q05": 1, "q00": 2, "q09": 3}

    window, never = compose(names, oracled, last, window_size=8)
    # never-checked in registration order (q07 excluded: not oracled;
    # q08's red row keeps it here)
    assert never == ["q01", "q02", "q04", "q06", "q08"]
    # pad: q05 (r1) first, then r2 ties (q00 before q03 by REGISTRATION
    # order, not alphabetical-by-round), then q09 (r3) — truncated at 8
    assert window == never + ["q05", "q00", "q03"]

    # exact fit and overflow both work; underflow raises
    full, _ = compose(names, oracled, last, window_size=9)
    assert full == never + ["q05", "q00", "q03", "q09"]
    with pytest.raises(ValueError, match="only 9"):
        compose(names, oracled, last, window_size=10)


def test_scan_cache_memoizes_per_session_and_table(spark):
    """queries/util.t memoizes per (session, resolved sf_dir, table) —
    added with the ADVICE-r7 laziness fix because spark.read.parquet
    runs a footer schema-inference job on EVERY call.  Lock the
    contract: same key returns the identical DataFrame object; a
    different table or sf_dir misses; relative/absolute paths resolve
    to one entry."""
    from image_matadata_batchprocessing_aws_spark.queries.util import t

    a = t(spark, "/root/testdata/sf0.001", "orders")
    b = t(spark, "/root/testdata/sf0.001", "orders")
    assert a is b
    c = t(spark, "/root/testdata/sf0.001/", "orders")  # trailing slash
    assert a is c
    d = t(spark, "/root/testdata/sf0.001", "customer")
    assert d is not a
    e = t(spark, "/root/testdata/sf0.01", "orders")
    assert e is not a
    # the cached frame is a live lazy plan, not a materialization
    assert a.limit(1).count() == 1
