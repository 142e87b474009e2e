"""Shared helpers for the streaming operators."""

from __future__ import annotations

_MULT_MS = {"millisecond": 1, "second": 1000, "minute": 60_000,
            "hour": 3_600_000, "day": 86_400_000}


def dur_ms(spec: str) -> int:
    """'10 minutes' / '1 hour' / '30 seconds' → milliseconds. The
    grammar is the subset of Spark's CalendarInterval the streaming
    operators accept for gaps/ttls (single integer + unit)."""
    n, unit = spec.split()
    return int(n) * _MULT_MS[unit.rstrip("s")]


def dur_us(spec: str) -> int:
    """Same grammar, microseconds."""
    return dur_ms(spec) * 1000
