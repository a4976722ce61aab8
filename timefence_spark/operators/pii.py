"""PII detection and redaction over document corpora.

Pretraining pipelines scrub personally identifiable information before
training (reference has no PII support; this mirrors the public C4/Dolma
practice: regex families for emails, IP addresses, phone numbers). All
operators are single projections built from ``regexp_extract_all`` /
``regexp_replace`` — whole-stage codegen, scan-speed at 100 TB, no shuffle.

Pattern contract: every pattern is restricted to constructs Java regex and
RE2 treat identically (character classes, bounded quantifiers, alternation,
non-capturing groups, ASCII ``\\b``) — no lookaround, no backreferences —
so external SQL oracles (DuckDB ``regexp_extract_all`` /
``regexp_replace(..., 'g')``) count and rewrite the same spans.

Redaction order is fixed (email, then phone, then IPv4) and the replacement
tokens are digit-free, so a later pattern can never match inside an earlier
redaction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Local-part @ domain.tld — deliberately simple (no quoted local parts);
# the standard corpus-scrubbing pattern, not an RFC validator.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

# Dotted quad, word-bounded so version strings like 1.2.3.4000 don't match
# on a prefix. Octet ranges are not validated (999.0.0.1 matches) — range
# checks cost a 3-way alternation per octet and scrubbing favors recall.
IPV4_PATTERN = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

# NANP-ish phone: optional +country code, optional parens on the area code,
# separators -, ., or space. Requires a separator between groups (pure
# 10-digit runs are left alone — they are usually ids, not phones).
PHONE_PATTERN = (
    r"\b(?:\+[0-9]{1,3}[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b"
)

# US SSN shape ddd-dd-dddd (format match only; no checksum exists for
# SSNs). Dash-separated to keep false positives on id-like digit runs low.
SSN_PATTERN = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"

# 16-digit payment-card shape in 4-4-4-4 groups (spaces or dashes).
# Format-only: Luhn checksums need arithmetic, not regex — run a
# Luhn-verifying pass downstream if precision matters.
CREDIT_CARD_PATTERN = r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b"

# (type, pattern, replacement) in application order. Replacements contain
# no digits or '@'/'.' runs, so later patterns cannot match inside them.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", EMAIL_PATTERN, "<EMAIL>"),
    ("phone", PHONE_PATTERN, "<PHONE>"),
    ("ipv4", IPV4_PATTERN, "<IP>"),
]

# Superset with the higher-false-positive families; opt in via
# ``rules=EXTENDED_PII_RULES``. Order matters: SSN before phone (a
# ddd-dd-dddd span must not be half-eaten by the phone pattern), cards
# before both (longest digit runs first).
EXTENDED_PII_RULES: list[tuple[str, str, str]] = [
    ("email", EMAIL_PATTERN, "<EMAIL>"),
    ("credit_card", CREDIT_CARD_PATTERN, "<CARD>"),
    ("ssn", SSN_PATTERN, "<SSN>"),
    ("phone", PHONE_PATTERN, "<PHONE>"),
    ("ipv4", IPV4_PATTERN, "<IP>"),
]


def _count(text: Column, pattern: str) -> Column:
    # NULL text means zero matches, not NULL counts: a caller filtering
    # with ~has_pii must not silently drop NULL-text documents. The
    # isNotNull guard (not just coalesce) keeps that true under the
    # legacy sizeOfNull=-1 config too, where coalesce alone would pass
    # -1 through as a "count".
    return F.coalesce(
        F.when(
            text.isNotNull(),
            F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0))),
        ),
        F.lit(0),
    )


def pii_signals(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    rules: list[tuple[str, str, str]] | None = None,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document PII match counts: one ``n_<family>`` column per rule
    (default families: ``n_email``, ``n_phone``, ``n_ipv4``), plus
    ``n_pii`` (sum) and ``has_pii``. Pass ``rules=EXTENDED_PII_RULES`` or
    your own ``(name, pattern, replacement)`` list for other families.

    Counts are computed on the RAW text independently per family (phone
    counts are not suppressed by an overlapping email match — families
    rarely overlap and independent counts keep each column meaningful on
    its own). NULL-text rows report zero counts and ``has_pii = false``
    (never NULL), so boolean filters see every document. One projection,
    no shuffle."""
    active = rules if rules is not None else PII_RULES
    keep = [F.col(c) for c in (keep_cols or [])]
    text = F.col(text_col)
    counts = df.select(
        F.col(id_col),
        *[
            _count(text, pat).alias(f"n_{name}")
            for name, pat, _ in active
        ],
        *keep,
    )
    total = None
    for name, _, _ in active:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return counts.select(
        id_col,
        *[f"n_{name}" for name, _, _ in active],
        total.alias("n_pii"),
        (total > 0).alias("has_pii"),
        *keep,
    )


def redact_pii(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    out_col: str = "text_redacted",
    rules: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Replace every PII span with its family's placeholder token.

    Rules apply in :data:`PII_RULES` order (email, phone, IPv4) — fixed and
    documented because order is observable where families overlap (a phone
    number inside an email's local part is consumed by the email rule).
    Keeps all input columns and appends ``out_col``; pass ``rules`` to
    swap in production patterns. One projection, no shuffle."""
    redacted: Column = F.col(text_col)
    for _, pattern, token in rules if rules is not None else PII_RULES:
        redacted = F.regexp_replace(redacted, pattern, token)
    return df.withColumn(out_col, redacted)
