"""URL canonicalization + URL-level deduplication.

Web-crawl pipelines dedup by URL *before* any content pass: the same
page is fetched as ``http://www.host.com:80/p/1?utm_source=feed&q=2#top``
and ``https://host.com/p/1?q=2`` across crawls, and collapsing those is
orders of magnitude cheaper than content fingerprinting (cf. the
reference's channel-naming normalization — geomagio/ObservatoryMetadata
normalizes instrument aliases the same way before merging streams).

Canonicalization rules (the standard crawl-frontier set):

- drop the fragment (``#...``)
- normalize the scheme: ``http://`` -> ``https://`` (protocol-relative
  duplicates collapse)
- strip a leading ``www.``
- strip explicit default ports ``:80`` / ``:443``
- drop tracking query parameters (``utm_*``, click ids), sort the
  surviving parameters bytewise, and re-join — parameter ORDER never
  distinguishes two URLs
- strip one trailing ``/`` from the path

Everything is built from engine-portable primitives — anchored RE2-safe
regexes (no lookaround/backreferences in the PATTERN; NOTES.md pii_scrub
lesson), ``split_part``, array filter/sort/join — so the whole operator,
including the keeper choice, is exactly oracle-checkable in DuckDB.

Scale shape: ``canonical_url`` is a map-only projection (whole-stage
codegen; the only lambda runs over a handful of query params per row);
``url_dedup`` adds exactly ONE shuffle, keyed on the canonical URL, and
the keeper rule (min doc id) is an aggregate — no window sort needed.
At 10^12 documents the canonical-url groups are tiny (revisits of one
page), so the aggregate is skew-free by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: query parameters that never identify content (prefix match)
TRACKING_PREFIXES = ("utm_",)
#: exact tracking parameter names (click / campaign ids)
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "mc_eid", "ref")


def canonical_url(url: Column) -> Column:
    """The canonical form of ``url`` as a pure-JVM column expression."""
    u = F.regexp_replace(url, r"#.*$", "")
    u = F.regexp_replace(u, r"^http://", "https://")
    u = F.regexp_replace(u, r"^https://www\.", "https://")
    # default ports: capture host and the char after the port (or end)
    u = F.regexp_replace(u, r"^(https://[^/:?]+):(80|443)([/?]|$)", "$1$3")
    base = F.split_part(u, F.lit("?"), F.lit(1))
    qs = F.split_part(u, F.lit("?"), F.lit(2))
    keep = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "")
        & ~p.startswith(TRACKING_PREFIXES[0])
        & ~F.split_part(p, F.lit("="), F.lit(1)).isin(*TRACKING_PARAMS),
    )
    return F.concat(
        F.regexp_replace(base, r"/$", ""),
        F.when(
            F.size(keep) > 0,
            F.concat(F.lit("?"), F.array_join(F.sort_array(keep), "&")),
        ).otherwise(F.lit("")),
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """One row per input document: (id, url, canonical_url, is_kept) —
    ``is_kept`` marks the deterministic keeper (minimum id) of each
    canonical-URL group, so ``where(is_kept)`` is the URL-deduplicated
    corpus manifest. One canonical-url-keyed shuffle total."""
    canon = df.select(
        id_col, url_col, canonical_url(F.col(url_col)).alias("canonical_url")
    )
    w = Window.partitionBy("canonical_url")
    return canon.select(
        id_col,
        url_col,
        "canonical_url",
        (F.col(id_col) == F.min(id_col).over(w)).alias("is_kept"),
    )
