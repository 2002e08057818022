"""Time-range resolution — the reference's 5 parameter patterns
(src/HistoryAPI.ts:336-371; defaults per src/history-provider.ts:70-123):

  1. from + to
  2. from + duration        -> [from, from+d)
  3. duration + to          -> [to-d, to)
  4. duration only          -> [now-d, now)
  5. nothing                -> last hour (v2 provider default)

All intervals are half-open [from, to). Bare timestamps are UTC (this
engine's cluster-wide convention; see functions/time.parse_iso).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from ..functions.time import default_resolution_ms, parse_duration_ms, parse_iso


@dataclass(frozen=True)
class TimeRange:
    from_ts: datetime
    to_ts: datetime

    @property
    def span_ms(self) -> int:
        return int((self.to_ts - self.from_ts).total_seconds() * 1000)


def resolve_time_range(
    from_iso: str | None = None,
    to_iso: str | None = None,
    duration: str | int | None = None,
    now: datetime | None = None,
) -> TimeRange:
    now = now or datetime.now(timezone.utc)
    f = parse_iso(from_iso) if from_iso else None
    t = parse_iso(to_iso) if to_iso else None
    d = timedelta(milliseconds=parse_duration_ms(duration)) if duration is not None else None

    if f and t:
        rng = TimeRange(f, t)
    elif f and d:
        rng = TimeRange(f, f + d)
    elif t and d:
        rng = TimeRange(t - d, t)
    elif d:
        rng = TimeRange(now - d, now)
    elif f:
        rng = TimeRange(f, now)
    else:
        rng = TimeRange(now - timedelta(hours=1), now)
    if rng.from_ts >= rng.to_ts:
        raise ValueError(f"empty/inverted time range {rng}")
    return rng


def resolve_resolution_ms(rng: TimeRange, resolution_s: float | None) -> int:
    """Explicit resolution (seconds) or the (to-from)/500 default
    (HistoryAPI.ts:957-959), clamped to >=1 ms (history-provider.ts:190-196)."""
    if resolution_s is not None:
        return max(1, int(resolution_s * 1000))
    return default_resolution_ms(rng.from_ts, rng.to_ts)
