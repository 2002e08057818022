"""PathSpec grammar — the History API's `paths=` parameter.

Grammar (reference: src/HistoryAPI.ts:2304-2364 parsePathSpecs):
    spec        := path [":" method] [":" smoothing [":" param]] ["|" sourceRef]
    method      := average|min|max|first|last|mid|middle_index|count|sum
    smoothing   := sma|ema
The smoothing param is parseFloat'ed exactly like the reference
(HistoryAPI.ts:2322-2348): `path:sma:5` → 5-bucket window,
`path:ema:0.3` → α=0.3. Both syntaxes are accepted: official
`path:sma:5` (smoothing only — the aggregate defaults to average and
`smoothing_only` is flagged) and the extension `path:average:sma:5`.
The inline `|sourceRef` filter forces the raw tier
(path-filters.ts:48-157, HistoryAPI.ts:1364-1369).

`paths` input is sanitized with the reference's injection-guard regex
(HistoryAPI.ts:63-70) even though Spark params are bound, not spliced.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..operators.aggregate import METHODS

SMOOTHERS = ("sma", "ema")
DEFAULT_SMA_PERIOD = 5
DEFAULT_EMA_ALPHA = 0.2
_SANITIZE_RE = re.compile(r"[^0-9a-zA-Z.,:_|\-]")


@dataclass(frozen=True)
class PathSpec:
    path: str
    method: str = "average"
    smoothing: str | None = None
    smoothing_param: float | None = None  # sma period or ema alpha (parseFloat)
    smoothing_only: bool = False  # official syntax: smoothing w/o explicit method
    source_ref: str | None = None

    @property
    def smoothing_window(self) -> int | None:
        """SMA window (int view of the param), None when unset."""
        return int(self.smoothing_param) if self.smoothing_param is not None else None

    @property
    def ema_alpha(self) -> float:
        """EMA α: the request's param, else the reference's default 0.2
        (HistoryAPI.ts defaultEmaAlpha)."""
        if self.smoothing == "ema" and self.smoothing_param is not None:
            return float(self.smoothing_param)
        return DEFAULT_EMA_ALPHA

    @property
    def column_name(self) -> str:
        """Result column label — path plus non-default decorations."""
        parts = [self.path]
        if not self.smoothing_only and self.method != "average":
            parts.append(self.method)
        if self.smoothing:
            param = self.smoothing_param
            if param is None:
                suffix = ""
            elif param == int(param):
                suffix = str(int(param))
            else:
                suffix = str(param)
            parts.append(f"{self.smoothing}{suffix}")
        return ":".join(parts)


def sanitize_paths_param(paths: str) -> str:
    return _SANITIZE_RE.sub("", paths)


def parse_path_spec(spec: str) -> PathSpec:
    spec = spec.strip()
    source_ref = None
    if "|" in spec:
        spec, source_ref = spec.split("|", 1)
    segments = spec.split(":")
    path, segments = segments[0], segments[1:]
    if not path:
        raise ValueError(f"empty path in spec {spec!r}")

    method = "average"
    smoothing = None
    param = None
    smoothing_only = False
    i = 0
    if i < len(segments) and segments[i] in METHODS:
        method = segments[i]
        i += 1
    elif i < len(segments) and segments[i] in SMOOTHERS:
        smoothing_only = True
    if i < len(segments) and segments[i] in SMOOTHERS:
        smoothing = segments[i]
        i += 1
        if i < len(segments):
            try:
                # parseFloat like the reference (HistoryAPI.ts:2332/2347) —
                # no range validation there either; nonsense params behave
                # as the arithmetic dictates
                param = float(segments[i])
                i += 1
            except ValueError as e:
                raise ValueError(f"bad smoothing param in {spec!r}") from e
    if i != len(segments):
        raise ValueError(f"unparseable path spec segments {segments[i:]!r} in {spec!r}")
    return PathSpec(path, method, smoothing, param, smoothing_only, source_ref)


def parse_paths_param(paths: str) -> list[PathSpec]:
    cleaned = sanitize_paths_param(paths)
    return [parse_path_spec(s) for s in cleaned.split(",") if s]
