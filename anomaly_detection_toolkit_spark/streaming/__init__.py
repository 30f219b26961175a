"""Streaming operators package + small shared utilities."""

from __future__ import annotations

_UNIT_S = {
    "microsecond": 1e-6, "microseconds": 1e-6,
    "millisecond": 1e-3, "milliseconds": 1e-3,
    "second": 1.0, "seconds": 1.0,
    "minute": 60.0, "minutes": 60.0,
    "hour": 3600.0, "hours": 3600.0,
    "day": 86400.0, "days": 86400.0,
    "week": 604800.0, "weeks": 604800.0,
}


def parse_duration_s(s: str) -> float:
    """Seconds from a Spark interval string — accepts everything
    ``withWatermark`` does ('10 seconds', '1 day', '500 milliseconds',
    '1 hour 30 minutes'), so operators that both declare a watermark
    AND do arithmetic with the same delay can't disagree with Spark
    about what the string means."""
    parts = s.strip().split()
    if not parts or len(parts) % 2:
        raise ValueError(f"bad duration {s!r}: expected '<n> <unit>' pairs")
    total = 0.0
    for qty, unit in zip(parts[::2], parts[1::2]):
        key = unit.lower()
        if key not in _UNIT_S:
            raise ValueError(f"bad duration {s!r}: unknown unit {unit!r}")
        total += float(qty) * _UNIT_S[key]
    return total


def await_streaming(query, timeout_s: float = 600.0) -> None:
    """awaitTermination that FAILS LOUDLY on timeout instead of
    letting the caller read a partially-written sink while the query
    keeps running in the background."""
    if not query.awaitTermination(timeout_s):
        query.stop()
        raise RuntimeError(
            f"streaming query did not finish within {timeout_s}s; "
            "sink contents would be partial — aborting"
        )
