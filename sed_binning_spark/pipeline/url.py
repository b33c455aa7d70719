"""URL canonicalization and URL-keyed dedup — the crawl-side twin of the
content dedup family: two fetches of one page usually differ only in the
URL's incidental decoration (scheme case, default port, tracking params,
fragment), so canonicalizing BEFORE content dedup removes the cheap
duplicate class without hashing any body bytes.

Everything is a Catalyst expression chain over ``try_parse_url`` — map-only,
no Python, no shuffle until the dedup groupBy (which carries only the
canonical-url digest and the id, never the documents).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query parameters that identify a CLICK, not a page — the standard
# tracking families (Google Analytics utm_*, click ids, referral tags).
# Bare ``ref=`` is deliberately NOT here: sites use it to select
# branches/versions/variants, so stripping it would merge distinct pages
TRACKING_PARAM_REGEX = (
    r"^(utm_[a-z]+|fbclid|gclid|dclid|msclkid|mc_eid|mc_cid|igshid|"
    r"_ga|ref_src|spm|yclid)="
)

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}


def canonical_url_expr(
    url: Column,
    drop_params_regex: str = TRACKING_PARAM_REGEX,
    keep_fragment: bool = False,
) -> Column:
    """Canonical form of a URL column:

    - scheme and host lower-cased; a scheme-default port dropped
      (``:8080`` and other explicit non-defaults survive)
    - empty path becomes ``/``
    - query parameters matching ``drop_params_regex`` removed (tracking
      families by default), the REST SORTED so parameter order cannot
      distinguish two fetches of one page; an emptied query drops its
      ``?``
    - the fragment dropped unless ``keep_fragment`` (fragments never
      reach the server, so two URLs differing only there fetched the
      same bytes)

    URLs ``try_parse_url`` cannot parse (no scheme/host) pass through
    unchanged rather than collapsing to NULL — an unparseable URL is
    still a distinct dedup key.
    """
    proto = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    authority = F.try_parse_url(url, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    default_port: Column = F.lit("")
    for scheme, dport in _DEFAULT_PORTS.items():
        default_port = F.when(proto == scheme, F.lit(dport)) \
            .otherwise(default_port)
    port_part = F.when(
        (port == "") | (port == default_port), F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.try_parse_url(url, F.lit("PATH"))
    path = F.when((path.isNull()) | (path == ""), F.lit("/")).otherwise(path)
    query = F.try_parse_url(url, F.lit("QUERY"))
    kept = F.array_join(
        F.array_sort(F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(drop_params_regex),
        )),
        "&",
    )
    query_part = F.when(
        query.isNull() | (kept == ""), F.lit(""),
    ).otherwise(F.concat(F.lit("?"), kept))
    frag = F.try_parse_url(url, F.lit("REF"))
    frag_part = (
        F.when(frag.isNull(), F.lit("")).otherwise(
            F.concat(F.lit("#"), frag),
        )
        if keep_fragment else F.lit("")
    )
    canon = F.concat(
        proto, F.lit("://"), host, port_part, path, query_part, frag_part,
    )
    # unparseable (relative, schemeless, garbage): keep the original so
    # the row stays dedupable by its own literal key
    return F.when(proto.isNull() | host.isNull(), url).otherwise(canon)


def canonicalize_urls(
    df: DataFrame,
    url_column: str = "url",
    output_column: str = "canonical_url",
    drop_params_regex: str = TRACKING_PARAM_REGEX,
    keep_fragment: bool = False,
) -> DataFrame:
    """Append the canonical form of ``url_column`` (map-only)."""
    return df.withColumn(
        output_column,
        canonical_url_expr(
            F.col(url_column), drop_params_regex, keep_fragment,
        ),
    )


def dedup_by_url(
    df: DataFrame,
    url_column: str = "url",
    id_column: str = "doc_id",
    keep: str = "min",
    drop_params_regex: str = TRACKING_PARAM_REGEX,
) -> DataFrame:
    """One row per canonical URL: (canonical_url, kept_id, n_dups) — the
    same keyed-groupBy shape as ``exact_dedup``, so the shuffle carries
    (canonical url, id) pairs only. NULL urls are not duplicates of each
    other and are excluded (content dedup handles them)."""
    if keep not in ("min", "max"):
        raise ValueError("keep must be 'min' or 'max'")
    agg = F.min(id_column) if keep == "min" else F.max(id_column)
    return (
        df.where(F.col(url_column).isNotNull())
        .groupBy(
            canonical_url_expr(
                F.col(url_column), drop_params_regex,
            ).alias("canonical_url"),
        )
        .agg(agg.alias("kept_id"), F.count(F.lit(1)).alias("n_dups"))
    )
