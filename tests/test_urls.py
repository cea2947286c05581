"""URL canonicalization edge cases and the canonical-URL dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.operators.urls import (
    add_url_canonical,
    registered_domain,
    url_host,
    url_normalize,
)

CASES = [
    # (raw, canonical)
    ("HTTP://Example.COM:80/a?b=2&a=1#frag", "http://example.com/a?a=1&b=2"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),  # non-default kept
    ("http://example.com:8080", "http://example.com:8080/"),  # empty path -> /
    ("https://a.b.c.example.org/p?utm_source=x&utm_medium=y", "https://a.b.c.example.org/p"),
    ("https://e.com/p?fbclid=abc&id=7&gclid", "https://e.com/p?id=7"),
    ("https://e.com/p?", "https://e.com/p"),  # empty query dropped
    ("https://e.com/p#only-fragment", "https://e.com/p"),
]


def test_normalization_cases(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)], "i long, url string")
    got = {r["i"]: r["n"] for r in df.select("i", url_normalize("url").alias("n")).collect()}
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (CASES[i][0], got[i], want)


def test_idempotent(spark):
    """Normalizing a normalized URL is a fixed point."""
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)], "i long, url string")
    once = df.select("i", url_normalize("url").alias("url"))
    twice = once.select("i", url_normalize("url").alias("again"), "url")
    assert all(r["again"] == r["url"] for r in twice.collect())


def test_host_and_domain(spark):
    df = spark.createDataFrame(
        [(0, "HTTPS://Sub.News.Example.CO:8443/x")], "i long, url string"
    )
    r = df.select(
        url_host("url").alias("h"), registered_domain(url_host("url")).alias("d")
    ).collect()[0]
    assert r["h"] == "sub.news.example.co"
    assert r["d"] == "example.co"


def test_canonical_dedup(spark):
    df = spark.createDataFrame(
        [
            (1, "https://e.com/p?a=1&b=2"),
            (2, "HTTPS://E.COM:443/p?b=2&a=1&utm_source=x#f"),
            (3, "https://e.com/other"),
        ],
        "doc_id long, url string",
    )
    rows = {r["doc_id"]: r for r in add_url_canonical(df).collect()}
    assert rows[1]["url_norm"] == rows[2]["url_norm"]
    assert rows[1]["url_rank"] == 1 and rows[2]["url_rank"] == 2
    assert rows[1]["n_url_dups"] == 2 and rows[3]["n_url_dups"] == 1


def test_stays_jvm_side(spark):
    from image_matadata_batchprocessing_aws_spark.plans import assert_no_python_udf

    df = spark.createDataFrame([(0, "https://e.com/")], "doc_id long, url string")
    assert_no_python_udf(add_url_canonical(df))
