"""True-wind derivation — the classic SignalK derived-data computation.

Apparent wind (what the masthead sensor measures) is the vector sum of
true wind and the vessel's own motion; the derived-data step every
SignalK installation runs inverts it:

    u = AWS * cos(AWA) - STW     (along-track true-wind component)
    v = AWS * sin(AWA)           (athwartships component)
    TWS = sqrt(u^2 + v^2),  TWA = atan2(v, u)

with AWA in radians relative to the bow (positive to starboard) and STW
the speed through water. Pure per-row Column arithmetic — map-only,
rides the scan, no UDF (the public formula, e.g. the signalk-derived-data
plugin's truewind calculation; no reference parity claim — the reference
stores paths, it does not derive them).

Cross-engine exactness class: sin/cos/atan2 carry the measured 1-2 ulp
cross-libm gap (tests/test_angular_margin.py), so gates aggregate the
components with registry.nano_avg and land outputs on the micro grid —
the angular_avg machinery verbatim. sqrt and the +-*/ are IEEE-exact
given bit-identical inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def true_wind_components(aws: Column, awa_rad: Column, stw: Column) -> tuple[Column, Column]:
    """(u, v) true-wind vector components from apparent wind + speed
    through water. Boat-frame: u along track (positive forward), v to
    starboard."""
    return aws * F.cos(awa_rad) - stw, aws * F.sin(awa_rad)


def true_wind_speed(u: Column, v: Column) -> Column:
    """|true wind| from components (IEEE-exact given exact inputs)."""
    return F.sqrt(u * u + v * v)


def true_wind_angle(u: Column, v: Column) -> Column:
    """True wind angle in radians relative to the bow, atan2 convention
    (positive to starboard, pi = dead downwind when u < 0)."""
    return F.atan2(v, u)
