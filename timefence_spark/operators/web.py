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
    u = F.col("__urls")
    return staged.select(
        id_col,
        # guarded like text._nsize: NULL text yields NULL counts on every
        # session config (legacy sizeOfNull would say -1)
        F.when(u.isNotNull(), F.size(u)).alias("n_urls"),
        F.when(
            u.isNotNull(),
            F.size(F.array_distinct(F.transform(u, _domain_of))),
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


# Container tags whose CONTENT is noise, not text: dropped wholesale.
# No regex backreferences (RE2 has none), so one pass per tag name.
_DROP_CONTENT_TAGS = ("script", "style", "head", "noscript", "template")

# Block-level tags whose boundaries become newlines, so downstream
# line-granular operators (line_dedup, chunking) see document structure.
_BLOCK_TAG_ALT = (
    "p|div|h1|h2|h3|h4|h5|h6|li|ul|ol|tr|table|blockquote|pre|"
    "section|article|header|footer|form"
)

# Fixed entity map, decoded in list order: named + the common numeric
# forms first, the ampersand itself LAST (standard decode order — doing
# & first would double-decode "&amp;lt;").
_HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&#160;", " "),
    ("&amp;", "&"),
]


def strip_html(
    df: DataFrame,
    *,
    id_col: str,  # noqa: ARG001 - symmetry with the other operators
    text_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Boilerplate-free text from raw HTML — the extraction step between
    a web crawl and every text-quality operator in this package (the
    role trafilatura/jusText play in public pipelines, reduced to its
    deterministic regex core).

    Pipeline (one projection, each step a single regexp pass):

    1. drop ``<script>/<style>/<head>/<noscript>/<template>`` blocks
       wholesale (their content is code, not text);
    2. drop HTML comments;
    3. turn block-tag boundaries (``<p>``, ``<div>``, headings, list
       items, ...) and ``<br>`` into newlines so document structure
       survives for line-granular operators;
    4. strip every remaining tag to a space;
    5. decode the fixed entity list (named + common numeric forms,
       ``&amp;`` last);
    6. collapse whitespace: blank-ish line runs to one newline,
       horizontal runs to one space, trim.

    Replaces ``text_col`` unless ``out_col`` is given. Every pattern is
    restricted to constructs Java regex and RE2 treat identically — no
    backreferences, no lookarounds — so an external SQL oracle replays
    the extraction byte-for-byte. Scan-speed, zero shuffle; NULL text
    stays NULL. This is deliberately NOT a DOM parser: malformed nesting
    degrades to extra whitespace, never to an error."""
    t = F.col(text_col)
    for tag in _DROP_CONTENT_TAGS:
        t = F.regexp_replace(t, f"(?is)<{tag}\\b[^>]*>.*?</{tag}\\s*>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, f"(?is)</?(?:{_BLOCK_TAG_ALT})\\b[^>]*>", "\n")
    t = F.regexp_replace(t, r"(?is)<br\s*/?>", "\n")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, rep in _HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.regexp_replace(t, r"[ \t\r]*\n[\s]*", "\n")
    t = F.regexp_replace(t, r"[ \t\r]+", " ")
    t = F.regexp_replace(t, r"^\s+|\s+$", "")
    return df.withColumn(out_col or text_col, t)


# ---------------------------------------------------------------------------
# URL canonicalization + URL-level dedup. A crawl sees the same page under
# many spellings — scheme/host case, default ports, tracking params in
# varying order, fragments, trailing slashes. Canonicalizing before
# content-level dedup removes the cheap bulk (exact re-fetches) so the
# expensive MinHash/embedding passes run on fewer rows.
# ---------------------------------------------------------------------------

# Query parameters that never change page content: analytics/attribution
# tags. Matched against the parameter NAME (the part before '='):
# prefixes for the utm_* family, exact names for the rest.
TRACKING_PARAM_PREFIXES = ("utm_",)
TRACKING_PARAM_NAMES = ("gclid", "fbclid", "msclkid", "mc_eid", "igshid")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"


def canonicalize_url(url: Column, *, strip_www: bool = False) -> Column:
    """RFC-3986-style normalization as ONE scan-speed expression chain
    (every regex is Java/RE2-identical, so SQL oracles replay it):

    1. trim; non-URLs (no ``scheme://``) pass through trimmed;
    2. drop the fragment (``#...``);
    3. lower-case scheme and authority; drop default ports
       (``http...:80``, ``https...:443``); optionally drop a leading
       ``www.`` (``strip_www=True``);
    4. strip trailing slashes from the path (``/a/b/`` == ``/a/b``;
       the root path collapses to none);
    5. drop tracking parameters (``utm_*``, gclid, fbclid, msclkid,
       mc_eid, igshid), sort the survivors byte-wise, re-join — and
       drop the ``?`` entirely when none survive.

    Deterministic and total: NULL stays NULL, nothing errors."""
    # NOT F.trim: SQL trim strips only ' ', and crawl cells carry tabs/
    # newlines around URLs. ASCII whitespace classes are Java/RE2-equal.
    u = F.regexp_replace(url, r"^[ \t\r\n]+|[ \t\r\n]+$", "")
    nofrag = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(nofrag, _AUTHORITY_RE, 1))
    auth = F.when(
        (scheme == "http") & auth.endswith(":80"),
        F.substring(auth, 1, F.length(auth) - 3),
    ).when(
        (scheme == "https") & auth.endswith(":443"),
        F.substring(auth, 1, F.length(auth) - 4),
    ).otherwise(auth)
    if strip_www:
        auth = F.when(
            auth.startswith("www."), F.substring(auth, 5, F.length(auth))
        ).otherwise(auth)
    path = F.regexp_replace(
        F.regexp_extract(nofrag, _PATH_RE, 1), r"/+$", ""
    )
    rawq = F.regexp_extract(nofrag, r"\?([^#]*)", 1)
    name = lambda p: F.substring_index(p, "=", 1)  # noqa: E731
    is_tracking = lambda p: F.lit(False)  # noqa: E731
    for pref in TRACKING_PARAM_PREFIXES:
        prev = is_tracking
        is_tracking = (
            lambda p, _prev=prev, _pref=pref:
            _prev(p) | name(p).startswith(_pref)
        )
    for nm in TRACKING_PARAM_NAMES:
        prev = is_tracking
        is_tracking = (
            lambda p, _prev=prev, _nm=nm: _prev(p) | (name(p) == _nm)
        )
    kept = F.array_sort(
        F.filter(
            F.split(rawq, "&"),
            lambda p: (p != "") & ~is_tracking(p),
        )
    )
    query = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), auth, path, query)
    return F.when(u.rlike(_SCHEME_RE), canon).otherwise(u)


def canonicalize_urls(
    df: DataFrame,
    *,
    url_col: str,
    out_col: str = "canonical_url",
    strip_www: bool = False,
) -> DataFrame:
    """Attach the canonical form of ``url_col`` as ``out_col`` — a pure
    projection, zero shuffle at any scale."""
    return df.withColumn(
        out_col, canonicalize_url(F.col(url_col), strip_www=strip_www)
    )


def url_dedup(
    df: DataFrame,
    *,
    id_col: str,
    url_col: str,
    strip_www: bool = False,
) -> DataFrame:
    """First-occurrence dedup on the CANONICAL URL: keeps the row with
    the minimum ``id_col`` per canonical form (deterministic at any
    partitioning), with the canonical form attached as
    ``canonical_url``. Rows with NULL urls are all kept (a missing URL
    identifies nothing).

    100 TB shape: canonicalization is scan-speed; the keep decision is
    ONE min-struct aggregation on the canonical key (map-side combining
    — no window, no row_number shuffle-and-sort of full rows), then the
    kept ids re-attach through an AQE-splittable equi-join that carries
    ids only. The same no-window shape as dedup.line_dedup."""
    canon = canonicalize_urls(
        df, url_col=url_col, strip_www=strip_www
    )
    winners = (
        canon.where(F.col(url_col).isNotNull())
        .groupBy("canonical_url")
        .agg(F.min(F.col(id_col)).alias("__keep_id"))
        .select(F.col("__keep_id").alias(id_col))
    )
    kept = canon.join(winners, on=id_col, how="leftsemi")
    nulls = canon.where(F.col(url_col).isNull())
    return kept.unionByName(nulls)
