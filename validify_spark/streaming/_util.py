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


def split_fragments(idxs: list, ts_us: list, gap_us: int) -> list:
    """Session-gap fragmentation of one conversation's accumulated
    turns (shared by every conversation-finalizing operator). The
    split happens HERE, not only via the state timeout: during a bulk
    replay the watermark lags arrivals, so turns separated by hours of
    event time can land in state before the first fragment's timeout
    fires. Splitting wherever consecutive event times differ by more
    than the gap makes fragment semantics independent of arrival
    batching; the timeout's only job is bounding state lifetime. Rows
    with NULL ts sort first and never force a split (no temporal
    position). Returns a list of fragments, each a list of positions
    into the input arrays in event-time order."""
    t_order = sorted(
        range(len(idxs)),
        key=lambda k: (ts_us[k] is not None, ts_us[k] or 0))
    frags, cur, prev_ts = [], [], None
    for k in t_order:
        t = ts_us[k]
        if (cur and t is not None and prev_ts is not None
                and t - prev_ts > gap_us):
            frags.append(cur)
            cur = []
        cur.append(k)
        if t is not None:
            prev_ts = t
    if cur:
        frags.append(cur)
    return frags


def order_turns(frag: list, idxs: list, ts_us: list) -> list:
    """Within-fragment turn order: None-first (idx, ts) — the batch
    checks' deterministic struct array_sort tie-break."""
    return sorted(
        frag,
        key=lambda k: (idxs[k] is not None, idxs[k] or 0,
                       ts_us[k] is not None, ts_us[k] or 0))
