"""HTML-to-text extraction: hand-written page vs expected visible text,
entity decode order, and the generated SQL twin's dialect parity."""

from __future__ import annotations

import duckdb

from image_matadata_batchprocessing_aws_spark.operators.html import html_to_text, html_to_text_sql

PAGE = (
    "<html><head><title>T</title>\n"
    "<style>body { margin: 0; }</style>\n"
    "<script>\nif (a < b && c > d) { alert(\"hi\"); }\n</script>\n"
    "</head><body>\n"
    "<h1>Header</h1>\n"
    "<p>First   paragraph with <b>bold</b> text.</p>\n"
    "<div><ul><li>one &amp; two</li><li>a &lt; b &gt; c</li></ul></div>\n"
    "<p>&quot;quoted&quot; &#39;single&#39;&nbsp;spaced</p>\n"
    "Line one<br/>Line two"
    "</body></html>"
)


def _expected_lines():
    return [
        "T",
        "Header",
        "First paragraph with bold text.",
        "one & two",
        "a < b > c",
        '"quoted" \'single\' spaced',
        "Line one",
        "Line two",
    ]


def test_visible_text(spark):
    df = spark.createDataFrame([(0, PAGE)], "i long, html string")
    out = df.select(html_to_text("html").alias("t")).collect()[0]["t"]
    assert out.split("\n") == _expected_lines()


def test_amp_decodes_last(spark):
    # '&amp;lt;' must become the literal '&lt;', never '<'
    df = spark.createDataFrame([(0, "<p>&amp;lt;tag&amp;gt;</p>")], "i long, html string")
    out = df.select(html_to_text("html").alias("t")).collect()[0]["t"]
    assert out == "&lt;tag&gt;"


def test_sql_twin_matches_spark(spark):
    pages = [
        (0, PAGE),
        (1, "<p>&amp;lt;x&amp;gt;</p>"),
        (2, "no markup at all"),
        (3, "<SCRIPT>evil()</SCRIPT>visible<BR>next"),
    ]
    df = spark.createDataFrame(pages, "i long, html string")
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text("html").alias("t")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE pages (i BIGINT, html VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", pages)
    sql = f"SELECT i, {html_to_text_sql('html')} AS t FROM pages"
    want = dict(con.execute(sql).fetchall())
    assert got == want


def test_stays_jvm_side(spark):
    from image_matadata_batchprocessing_aws_spark.plans import assert_no_python_udf

    df = spark.createDataFrame([(0, PAGE)], "i long, html string")
    assert_no_python_udf(df.select(html_to_text("html")))
