"""Geo distance — Manticore's GEODIST() scalar re-expressed as a pure
codegen column (no UDF): haversine great-circle distance in meters on a
spherical earth (R = 6371000 m, the common mean radius; the reference's
parent engine exposes the same function family for geo-ranked search).

Determinism note: sin/cos/asin evaluate via JVM StrictMath-compatible
intrinsics (<=1 ulp); cross-engine oracles round to 3 decimals (mm) so
a last-ulp difference at meter magnitudes (~1e-10 m) can never flip a
rounded value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters between (lat1, lon1) and
    (lat2, lon2) in degrees."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    # asin form: stable for the small angles that dominate ranking
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def haversine_m_py(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Python twin for differential tests."""
    import math

    rlat1, rlat2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    a = (
        math.sin(dlat / 2) ** 2
        + math.cos(rlat1) * math.cos(rlat2) * math.sin(dlon / 2) ** 2
    )
    return 2.0 * EARTH_RADIUS_M * math.asin(math.sqrt(a))
