"""Error hierarchy.

Mirrors the reference's error taxonomy and "WHAT -> WHY -> WHERE -> HOW"
message style (/root/reference/src/timefence/errors.py:1-132) so users of the
reference see equivalent diagnostics from the Spark engine.
"""

from __future__ import annotations


class TimefenceError(Exception):
    """Base error for all engine operations."""


class TimefenceSchemaError(TimefenceError):
    """Schema validation failure (missing columns, type mismatches)."""


class TimefenceDuplicateError(TimefenceError):
    """Duplicate (key, feature_time) pairs detected."""


class TimefenceTimezoneError(TimefenceError):
    """Mixed timezone-aware and timezone-naive timestamps."""


class TimefenceConfigError(TimefenceError):
    """Invalid parameter combination or configuration."""


class TimefenceLeakageError(TimefenceError):
    """Temporal leakage detected (raised by report.assert_clean())."""


class TimefenceValidationError(TimefenceError):
    """General validation failure on inputs."""


def _similar_names(missing: list[str], candidates: list[str]) -> dict[str, str]:
    """Suggest likely renames via case/underscore-insensitive containment."""
    found: dict[str, str] = {}
    for m in missing:
        norm_m = m.lower().replace("_", "")
        for c in candidates:
            norm_c = c.lower().replace("_", "")
            if norm_m in norm_c or norm_c in norm_m:
                found[m] = c
                break
    return found


def schema_error_missing_key(
    feature_name: str, expected_keys: list[str], actual_columns: list[str]
) -> TimefenceSchemaError:
    missing = [k for k in expected_keys if k not in actual_columns]
    similar = _similar_names(missing, actual_columns)
    lines = [
        f"Feature '{feature_name}' is missing required key column(s): {missing}.",
        "",
        "  Point-in-time joins require matching keys between labels and features.",
        f"  Without {missing}, the engine can't tell which feature rows belong to which entity.",
        "",
        f"  Expected keys: {expected_keys}",
        f"  Actual columns: {actual_columns}",
    ]
    if similar:
        for m, s in similar.items():
            lines.append(f"  '{s}' is similar to '{m}' — possible rename?")
        mapping = {k: v for k, v in similar.items() if k in missing}
        lines += ["", "  Fix: add key_mapping to the feature definition:", f"    key_mapping={mapping}"]
    return TimefenceSchemaError("\n".join(lines))


def duplicate_error(
    feature_name: str, count: int, examples: list[dict]
) -> TimefenceDuplicateError:
    lines = [
        f"Feature '{feature_name}' has {count} duplicate (key, feature_time) pairs.",
        "",
        "  With several feature rows sharing a key and timestamp, the point-in-time",
        "  join becomes non-deterministic: the engine cannot guarantee which row wins.",
        "",
        f"  Example duplicates (showing first {min(3, len(examples))}):",
    ]
    lines += [f"    {ex}" for ex in examples[:3]]
    lines += [
        "",
        "  Fix (pick one):",
        "    1. Deduplicate in your source data or SQL",
        '    2. Set: Feature(..., on_duplicate="keep_any")',
    ]
    return TimefenceDuplicateError("\n".join(lines))


def timezone_error(
    feature_name: str,
    label_tz: str | None,
    feature_tz: str | None,
    label_sample: str,
    feature_sample: str,
) -> TimefenceTimezoneError:
    label_desc = f"timezone-aware ({label_tz})" if label_tz else "timezone-naive"
    feat_desc = f"timezone-aware ({feature_tz})" if feature_tz else "timezone-naive"
    return TimefenceTimezoneError(
        f"Mixed timezones between labels and feature '{feature_name}'.\n\n"
        f"  Labels 'label_time' is {label_desc}.\n"
        f"  Feature '{feature_name}' timestamp is {feat_desc}.\n\n"
        "  Comparing these directly could shift joins by hours.\n\n"
        "  Sample values:\n"
        f"    label_time:   {label_sample}\n"
        f"    feature_time: {feature_sample}\n"
    )


def config_error_embargo_lookback(embargo: str, max_lookback: str) -> TimefenceConfigError:
    return TimefenceConfigError(
        f"embargo ({embargo}) must be less than max_lookback ({max_lookback}).\n\n"
        "  When embargo equals or exceeds max_lookback the join window is empty —\n"
        "  no feature row can ever match. Almost certainly a misconfiguration.\n\n"
        f"  Current: max_lookback={max_lookback}, embargo={embargo} → empty window\n"
        "  Fix: increase max_lookback or decrease embargo.\n"
    )
