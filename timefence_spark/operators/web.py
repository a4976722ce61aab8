"""URL extraction and domain-based filtering for web-scraped corpora.

Crawled pretraining data is filtered by source domain (blocklists of spam
or adult domains, allowlists of curated sources) and analyzed by link
profile. All expression-level work uses regex constructs Java regex and
RE2 treat identically (see ``operators.pii``), so external SQL oracles
replay extraction exactly.

100 TB shape: extraction is scan-speed projection; domain aggregation is
one partial-agg shuffle on the domain key; blocklist filtering broadcasts
the (always small) blocklist to a left-anti hash join — the corpus is
never shuffled to drop blocked rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://host[:port][/path] — host chars then anything non-space,
# non-quote. Deliberately simple: corpus link mining, not an RFC parser.
URL_PATTERN = r"https?://[A-Za-z0-9.-]+(?::[0-9]+)?(?:/[^\s\"'<>]*)?"

# Host portion of a matched URL (group 1): chars between the scheme and
# the first :, /, or end.
_HOST_PATTERN = r"https?://([A-Za-z0-9.-]+)"


def _domain_of(url: Column) -> Column:
    """Lower-cased host; registrable-domain truncation is left to the
    caller (public-suffix lists are data, not code)."""
    return F.lower(F.regexp_extract(url, _HOST_PATTERN, 1))


def extract_urls(
    df: DataFrame, *, id_col: str, text_col: str
) -> DataFrame:
    """One row per (document, URL occurrence): ``url`` and its ``domain``
    (lower-cased host). Duplicate URLs within a document are kept —
    callers count or distinct as needed. Scan-speed explode; no shuffle."""
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), F.lit(0))
            ).alias("url"),
        )
        .withColumn("domain", _domain_of(F.col("url")))
    )


def url_signals(df: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """Per-document link profile: ``n_urls``, ``n_domains`` (distinct),
    ``link_density`` (URL characters / total characters, 6dp). High link
    density is a standard boilerplate/spam signal. One projection."""
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), F.lit(0))
    staged = df.select(
        F.col(id_col),
        F.length(text_col).alias("__chars"),
        urls.alias("__urls"),
    )
    url_chars = F.aggregate(
        F.col("__urls"), F.lit(0).cast("long"), lambda acc, u: acc + F.length(u)
    )
    return staged.select(
        id_col,
        F.size("__urls").alias("n_urls"),
        F.size(
            F.array_distinct(F.transform(F.col("__urls"), _domain_of))
        ).alias("n_domains"),
        F.round(
            url_chars.cast("double") / F.greatest(F.col("__chars"), F.lit(1)), 6
        ).alias("link_density"),
    )


def domain_counts(df: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """Corpus-level domain frequency: (domain, n_urls, n_docs), the input
    to blocklist curation. One partial-agg shuffle on domain; map-side
    combine keeps shuffle volume at |distinct domains per partition|."""
    return (
        extract_urls(df, id_col=id_col, text_col=text_col)
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct(id_col).alias("n_docs"),
        )
    )


def filter_blocked_domains(
    df: DataFrame,
    blocklist: DataFrame | list[str],
    *,
    id_col: str,
    text_col: str,
    invert: bool = False,
) -> DataFrame:
    """Drop documents that link to any blocklisted domain (``invert=True``
    keeps only those — the allowlist form). Blocklist matching is exact on
    the lower-cased host.

    Plan shape: extract (doc, domain) pairs, semi join against the
    broadcast blocklist (small by nature — hinted), then semi/anti join
    the blocked doc ids back to the corpus. The full text column never
    enters a shuffle; the ids join is left un-hinted because the blocked
    set's size is data-dependent (a spam-heavy crawl can block a large
    corpus fraction) — AQE picks broadcast when it fits."""
    spark = df.sparkSession
    if isinstance(blocklist, list):
        blocklist = spark.createDataFrame(
            [(d.lower(),) for d in blocklist], "domain string"
        )
    else:
        blocklist = blocklist.select(F.lower(F.col("domain")).alias("domain"))
    pairs = extract_urls(df, id_col=id_col, text_col=text_col).select(
        id_col, "domain"
    )
    blocked_ids = pairs.join(
        F.broadcast(blocklist), "domain", "left_semi"
    ).select(id_col).distinct()
    how = "left_semi" if invert else "left_anti"
    return df.join(blocked_ids, id_col, how)
