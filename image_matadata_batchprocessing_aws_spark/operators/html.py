"""HTML-to-text extraction — the step before every web-corpus filter.

Crawl pipelines (C4, RefinedWeb, Dolma) reduce raw HTML to visible
text before quality filtering and dedup.  This is that reducer as a
chain of pure JVM regex expressions — zero Python in the hot path,
and every pattern is RE2-safe (no backreferences or lookaheads) so the
DuckDB oracle twin runs the EXACT same chain:

1. ``<script>``/``<style>`` blocks drop whole (non-greedy, DOTALL);
2. ``<br>`` and closing block tags (``p/div/li/tr/h1-6``) become
   newlines so block structure survives as line structure;
3. remaining tags become spaces;
4. the five core entities decode (``&lt; &gt; &quot; &#39; &nbsp;``),
   then ``&amp;`` LAST so ``&amp;lt;`` cannot double-decode;
5. whitespace normalizes: runs of spaces/tabs collapse, lines trim,
   blank-line runs collapse, outer trim.

This is syntax-level extraction (the distributed-pipeline part), not a
DOM parser: comments/CDATA and exotic entities are out of scope and
documented as such.

Scale notes: one map-side projection per row — no shuffle, no fit
pass; composes with ``add_gopher_rules`` / dedup downstream exactly
like the reference pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: (pattern, replacement) applied in order — mirrored verbatim by
#: :func:`html_to_text_sql`.
HTML_RULES: list[tuple[str, str]] = [
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?i)<br[ \t]*/?>", "\n"),
    (r"(?i)</(p|div|li|tr|h1|h2|h3|h4|h5|h6)>", "\n"),
    (r"<[^>]+>", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&nbsp;", " "),
    (r"&amp;", "&"),
    (r"[ \t]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n+", "\n"),
    # trim() strips only spaces in both engines, so outer newlines go
    # here (RE2 and Java agree: ^/$ anchor the whole string sans MULTILINE)
    (r"^[ \n]+|[ \n]+$", ""),
]


def html_to_text(col: Column | str) -> Column:
    """Visible text of an HTML column (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in HTML_RULES:
        c = F.regexp_replace(c, pat, repl)
    return F.trim(c)


def html_to_text_sql(expr: str) -> str:
    """The DuckDB twin: the same rule chain as ``regexp_replace(...,
    'gs'/'g')`` nesting.  Flags embed in the patterns (RE2 inline
    ``(?is)``), matching the Spark side byte for byte."""
    out = expr
    for pat, repl in HTML_RULES:
        # DuckDB single-quoted literals keep backslashes raw, so the
        # Java-regex escapes (\t, \n) pass through to RE2 unchanged.
        sql_pat = pat.replace("'", "''")
        sql_repl = repl.replace("'", "''").replace("\n", "' || chr(10) || '")
        out = f"regexp_replace({out}, '{sql_pat}', '{sql_repl}', 'g')"
    return f"trim({out})"
