"""HTML-to-text extraction: hand-written page vs expected visible text,
entity decode order, and the generated SQL twin's dialect parity."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

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


FRAGMENTS = [
    "<script>", "</script>", "<style>", "</style>", "<br/>", "<br>",
    "<p>", "</p>", "<div class=\"x\">", "</div>", "<li>", "</li>",
    "<h2>", "</h2>", "<span>", "</span>", "<", ">", "&", "&amp;",
    "&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;", "&amp;lt;",
    "if (a < b) alert(\"x\");", "p { color: red; }", "text", "Zürich",
    " ", "  ", "\t", "\n", "\n\n", "...", "- bullet", "'", "\"",
]


@settings(max_examples=15, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(FRAGMENTS), min_size=0, max_size=25).map("".join),
        min_size=1,
        max_size=8,
    )
)
def test_html_rules_cross_engine_fuzz(spark, docs):
    """The HTML_RULES chain must produce byte-identical output in Spark
    (Java regex) and DuckDB (RE2) on adversarial tag/entity soup — this
    is the guarantee that lets the oracle twin be GENERATED from the
    same rule table."""
    import duckdb
    import pandas as pd

    from image_matadata_batchprocessing_aws_spark.operators.html import (
        html_to_text,
        html_to_text_sql,
    )

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(docs)], "i long, s string"
    )
    got = {
        r.i: r.t
        for r in df.select("i", html_to_text("s").alias("t")).collect()
    }
    con = duckdb.connect()
    con.register("docs_pd", pd.DataFrame({"i": range(len(docs)), "s": docs}))
    expected = dict(
        con.execute(
            f"SELECT i, {html_to_text_sql('s')} FROM docs_pd"
        ).fetchall()
    )
    assert got == expected
