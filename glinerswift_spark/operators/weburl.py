"""[NORTH-RULE, no ref] URL structure ops for Common-Crawl-style pages.

The input_hint table keys pages by url; every practical web-corpus job
needs the same three derived columns — host, registered-domain-ish tail,
path depth — for per-domain skew diagnostics, mega-domain salting
decisions, and per-site quality aggregation. Pure column expressions
(scan-speed, whole-stage codegen, no UDF) built only from
regexp_extract / replace / length so the DuckDB oracle replays them
verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_HOST_RE = "^[a-z][a-z0-9+.-]*://([^/?#]+)"
_PATH_RE = "^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)"
_TLD_RE = "\\.([a-z0-9-]+)$"


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds host, tld, path, path_depth columns.

    path_depth counts '/' in the path component (query/fragment
    excluded): computed as length(path) - length(replace(path, '/', ''))
    — the one '/'-count formula that is byte-identical across engines
    (split()-based counts disagree on trailing separators).
    """
    url = F.col(url_col)
    host = F.regexp_extract(url, _HOST_RE, 1)
    path = F.regexp_extract(url, _PATH_RE, 1)
    return df.withColumns(
        {
            "host": host,
            "tld": F.regexp_extract(host, _TLD_RE, 1),
            "path": path,
            "path_depth": (
                F.length(path) - F.length(F.replace(path, F.lit("/"), F.lit("")))
            ).cast("int"),
        }
    )


def domain_stats(df: DataFrame, url_col: str = "url", chars_col: str = "n_chars") -> DataFrame:
    """Per-host corpus profile: page count, total chars, max path depth,
    distinct langs. ONE map-side-combined groupBy over the scan — the
    skew census you run BEFORE choosing salt factors for mega-domains
    (a host holding >1/partitions of the rows needs a salted key).
    """
    parts = with_url_parts(df, url_col)
    return parts.groupBy("host", "tld").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(F.col(chars_col)).alias("total_chars"),
        F.max("path_depth").alias("max_depth"),
        F.countDistinct("lang").alias("n_langs"),
    )


# tracking params every crawl dedup strips (the public-consensus set).
# Anchored to the preceding ?/& separator (kept via $1) so the param NAME
# must start right after it — an unanchored 'ref=' would also match inside
# longer names (href=, xref=, pref=) and even path segments, silently
# collapsing distinct URLs. DuckDB's RE2 replay spells the backref '\\1'.
_TRACK_RE = "([?&])(utm_[a-zA-Z]+|fbclid|gclid|ref)=[^&#]*"


def canonical_url_expr(url_col):
    """Canonical URL form for crawl dedup, as one column expression:
    lowercase scheme/host, default :80/:443 ports stripped, fragment
    stripped, tracking params (utm_*, fbclid, gclid, ref) removed with
    separator cleanup, trailing '/' normalized ('' path -> '/'). Only
    regexp_extract/replace + lower/concat in the Java-regex∩RE2 subset,
    so the DuckDB oracle replays canonical bytes exactly.

    Deliberately NOT done (documented): percent-decoding and query-param
    reordering — both need per-char loops or sorts that belong in a UDF,
    and crawl frontiers emit params in stable order anyway."""
    url = url_col if not isinstance(url_col, str) else F.col(url_col)
    scheme = F.lower(F.regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    hostport = F.regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    host = F.regexp_replace(F.lower(hostport), ":(80|443)$", "")
    rest = F.regexp_replace(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+", "")
    rest = F.regexp_replace(rest, "#.*", "")
    rest = F.regexp_replace(rest, _TRACK_RE, "$1")
    rest = F.regexp_replace(rest, "[?&]+$", "")
    rest = F.regexp_replace(rest, "\\?&", "?")
    rest = F.regexp_replace(rest, "&&+", "&")
    rest = F.regexp_replace(rest, "/\\?", "?")  # '/Path/?q' == '/Path?q'
    rest = F.regexp_replace(rest, "/$", "")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(rest == "", F.lit("/"))
        .when(rest.startswith("?"), F.concat(F.lit("/"), rest))
        .otherwise(rest),
    )


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Crawl-frontier URL dedup: one row per canonical URL with the
    duplicate count and the min-id keeper — the fetch-once gate that
    runs BEFORE any content ever downloads (content dedup can't save
    the bandwidth this does). One map-side-combined groupBy over a
    scan-side canonicalization expression; at 10^12 URLs the shuffle
    carries one row per DISTINCT canonical URL, the irreducible
    minimum."""
    return (
        df.select(
            canonical_url_expr(url_col).alias("canonical_url"),
            F.col(id_col).alias("__id"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.min("__id").alias("keeper"),
        )
    )


QUALITY_SCALE = 1_000_000


def host_quality_gate(
    df: DataFrame,
    url_col: str = "url",
    quality_col: str = "quality",
    min_avg_scaled: int = 640_000,
    min_pages: int = 2,
) -> DataFrame:
    """Domain-level quality gating — the two-level aggregation every
    web-corpus curation pipeline runs: per-doc quality (already a
    scan-side expression) rolls up to a per-host mean, and hosts with
    enough evidence (>= min_pages) below the threshold are marked for
    wholesale removal. Returns (host, n_pages, avg_q_int, keep).

    The mean is integer-exact: per-doc quality (rounded to 6dp
    upstream) scales to a BIGINT, and avg_q_int = sum div count — float
    averages differ in the last ulp across engines' sum orders, integer
    division does not. Small hosts (< min_pages) keep by default:
    too little evidence to condemn a domain.

    Scale shape: one map-side-combined groupBy(host); the host relation
    is domain-cardinality (tiny vs docs) — downstream filtering joins
    it back broadcast."""
    parts = with_url_parts(df, url_col)
    q_int = F.expr(
        f"CAST(round({quality_col} * {QUALITY_SCALE}) AS BIGINT)"
    )
    agg = (
        parts.select(F.col("host"), q_int.alias("__q"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.expr("sum(__q) div count(1)").alias("avg_q_int"),
        )
    )
    keep = ~(
        (F.col("n_pages") >= min_pages)
        & (F.col("avg_q_int") < min_avg_scaled)
    )
    return agg.select("host", "n_pages", "avg_q_int", keep.alias("keep"))
