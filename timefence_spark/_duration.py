"""Human-readable duration strings ("30d", "1d12h", "30m", "15s") <-> timedelta.

Same grammar as the reference (/root/reference/src/timefence/_duration.py:8-44):
optional day/hour/minute/second components, in that order. Durations never
contain months/years, so they are fixed-width and map exactly onto Spark
day-time intervals (no calendar ambiguity).
"""

from __future__ import annotations

import re
from datetime import timedelta

_DURATION_RE = re.compile(r"^(?:(\d+)d)?(?:(\d+)h)?(?:(\d+)m)?(?:(\d+)s)?$")


def parse_duration(value: str | timedelta | None) -> timedelta | None:
    """Parse "30d" / "1d12h" / "6h" / "30m" / "15s" (or passthrough)."""
    if value is None:
        return None
    if isinstance(value, timedelta):
        return value
    text = value.strip()
    if text == "0":
        return timedelta(0)
    m = _DURATION_RE.match(text)
    if not m or not text:
        raise ValueError(
            f"Invalid duration '{value}'. Expected e.g. '30d', '6h', '1d12h', '45m', '15s'."
        )
    d, h, mi, s = (int(g or 0) for g in m.groups())
    return timedelta(days=d, hours=h, minutes=mi, seconds=s)


def format_duration(td: timedelta | None) -> str | None:
    """Inverse of parse_duration; 0 renders as '0d'."""
    if td is None:
        return None
    total = int(td.total_seconds())
    if total == 0:
        return "0d"
    days, rest = divmod(total, 86400)
    hours, rest = divmod(rest, 3600)
    minutes, seconds = divmod(rest, 60)
    out = []
    if days:
        out.append(f"{days}d")
    if hours:
        out.append(f"{hours}h")
    if minutes:
        out.append(f"{minutes}m")
    if seconds:
        out.append(f"{seconds}s")
    return "".join(out)


def duration_seconds(td: timedelta | None) -> int | None:
    """Whole seconds of a duration (used for interval arithmetic in Spark)."""
    if td is None:
        return None
    return int(td.total_seconds())
