"""URL canonicalization + canonical-URL dedup — a training-data
curation primitive (crawled corpora carry the same page under many
URL spellings: case-variant hosts, default ports, tracking params,
unordered query strings, fragments, trailing slashes).

Canonical form (documented contract, pinned by tests and the DuckDB
oracle, which implements the SAME rules independently with regexes):

1. scheme lowercased;
2. authority lowercased, default port stripped (``:80`` for http,
   ``:443`` for https);
3. path: trailing ``/`` stripped; empty path becomes ``/``;
4. query: ``&``-split, tracking params dropped (name starts with
   ``utm_`` or is ``fbclid``/``gclid``/``ref``), remainder sorted
   lexicographically and re-joined; empty result drops the ``?``;
5. fragment dropped.

Everything is built-in Column expressions (parse_url + array ops) —
JVM-side, whole-stage-codegen, no UDF; at 100 TB this is a pure
map-side projection followed by one dedup shuffle on the canonical
key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING_PREFIXES = ("utm_",)
_TRACKING_NAMES = ("fbclid", "gclid", "ref")


def _is_tracking(param: Column) -> Column:
    name = F.split(param, "=", 2).getItem(0)
    cond = F.lit(False)
    for p in _TRACKING_PREFIXES:
        cond = cond | name.startswith(p)
    for n in _TRACKING_NAMES:
        cond = cond | (name == n)
    return cond


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL per the module contract; null for null input."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    authority = F.lower(F.parse_url(u, F.lit("AUTHORITY")))
    authority = (
        F.when(
            (scheme == "http") & authority.endswith(":80"),
            F.substring(authority, F.lit(1), F.length(authority) - 3),
        )
        .when(
            (scheme == "https") & authority.endswith(":443"),
            F.substring(authority, F.lit(1), F.length(authority) - 4),
        )
        .otherwise(authority)
    )
    path = F.parse_url(u, F.lit("PATH"))
    path = F.regexp_replace(F.coalesce(path, F.lit("")), "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.parse_url(u, F.lit("QUERY"))
    kept = F.array_sort(
        F.filter(
            F.split(F.coalesce(query, F.lit("")), "&"),
            lambda p: (p != "") & ~_is_tracking(p),
        )
    )
    qtail = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.when(
        u.isNull() | scheme.isNull() | authority.isNull(), F.lit(None).cast("string")
    ).otherwise(F.concat(scheme, F.lit("://"), authority, path, qtail))


def dedup_by_canonical_url(
    df: DataFrame, id_col: str, url_col: str
) -> DataFrame:
    """Group rows by canonical URL: (canonical_url, n_docs, keeper_id)
    with keeper = min id — the same first-wins contract as exact text
    dedup (operators/dedup.exact_dedup). One map-side projection + one
    aggregation shuffle on the canonical key; partial aggregation
    combines map-side, so the shuffle carries one row per (partition,
    canonical) — safe at crawl scale."""
    return (
        df.select(
            F.col(id_col).alias("_id"),
            canonicalize_url(F.col(url_col)).alias("canonical_url"),
        )
        .filter(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("_id").alias("keeper_id"),
        )
    )
