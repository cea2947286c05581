"""URL normalization and canonical-URL dedup — web-corpus curation.

Web-scale pretraining corpora (C4, RefinedWeb, Common Crawl derivates)
dedup first by CANONICAL URL before any content hashing: the same page
is crawled under scheme/host case variants, default ports, tracking
parameters, shuffled query strings, and fragments.  This module is
that normalizer as pure JVM expressions (zero Python, zero shuffle),
plus the registered-domain extractor used for per-site quotas.

Normalization (RFC 3986 syntax-based, plus the tracking-param strip
every crawler applies):

- scheme and host lowercase;
- default port dropped (``http:80``, ``https:443``), others kept;
- empty path becomes ``/``;
- query parameters: tracking keys (``utm_*``, ``fbclid``, ``gclid``)
  and empty segments dropped, the rest SORTED (byte order) so
  ``?b=2&a=1`` and ``?a=1&b=2`` canonicalize identically;
- fragment dropped.

All regexes are RE2-safe (no backrefs/lookaheads) so the DuckDB oracle
twins run the same patterns.

Scale notes: per-row string expressions — fully map-side, pushdown
friendly.  The canonical-URL dedup is one shuffle on ``url_norm``
(never page content), the same shape as exact text dedup
(``operators/dedup.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Query keys stripped during canonicalization.
TRACKING_PREFIXES = ("utm_",)
TRACKING_KEYS = ("fbclid", "gclid")


def _is_tracking(param: Column) -> Column:
    cond = param == ""
    for p in TRACKING_PREFIXES:
        cond = cond | param.startswith(p)
    for k in TRACKING_KEYS:
        cond = cond | param.startswith(k + "=") | (param == k)
    return cond


def url_normalize(col: Column | str) -> Column:
    """Canonical form of a URL column (see module docstring)."""
    u = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    host = F.lower(F.regexp_extract(auth, r"^([^:]*)", 1))
    port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == F.lit("80")))
        & ~((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(F.split(query, "&"), lambda x: ~_is_tracking(x))
    )
    qpart = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.concat_ws("&", params))
    ).otherwise(F.lit(""))
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        qpart,
    )


def url_host(col: Column | str) -> Column:
    u = F.col(col) if isinstance(col, str) else col
    auth = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    return F.lower(F.regexp_extract(auth, r"^([^:]*)", 1))


def registered_domain(host: Column | str) -> Column:
    """Last two DNS labels (the per-site quota key; a public-suffix
    list would refine multi-label TLDs — out of scope for the synthetic
    corpus)."""
    h = F.col(host) if isinstance(host, str) else host
    return F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)


def add_url_canonical(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Adds ``url_norm`` / ``host`` / ``domain`` and the canonical-URL
    dedup verdict: ``url_rank`` (1 = the keeper, deterministic by
    ``id_col``) and ``n_url_dups`` (crawl multiplicity of the canonical
    form).  One shuffle on ``url_norm``."""
    from pyspark.sql import Window

    out = df.withColumns(
        {
            "url_norm": url_normalize(url_col),
            "host": url_host(url_col),
            "domain": registered_domain(url_host(url_col)),
        }
    )
    w = Window.partitionBy("url_norm")
    return out.withColumns(
        {
            "url_rank": F.row_number().over(w.orderBy(id_col)).cast("long"),
            "n_url_dups": F.count("*").over(w).cast("long"),
        }
    )
