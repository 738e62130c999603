"""Scalar expression builders mirroring the reference's row expressions.

Reference parity (file:line cites into /root/reference):

- ``js_coalesce``  — JS falsy ``||`` default (task.ts:241-244): replaces
  NULL **and** empty string, not just NULL (SURVEY.md §4 trap 2).
- ``callsign``     — ranked fallback ``name ? name : state-plate``
  (task.ts:261-263).
- ``kmh_to_ms``    — ``speed * 0.277778`` unit conversion (task.ts:276).
- ``surrogate_key``— ``'geotab-' + device.id`` stable id (task.ts:270).
- ``geojson_point``— Point geometry struct (task.ts:279-282).
- ``haversine_km`` — not in the reference; natural math-function
  composition for its GPS domain (SURVEY.md §2 P15).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KMH_TO_MS = 0.277778  # task.ts:276 "Convert km/h => m/s"


def js_coalesce(col: Column | str, default: str) -> Column:
    """JS `||` semantics: NULL or '' → default (task.ts:241-244)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull() | (c == F.lit("")), F.lit(default)).otherwise(c)


def callsign(
    name: Column | str,
    license_state: Column | str,
    license_plate: Column | str,
) -> Column:
    """`name ? name : \\`${licenseState ?? 'US'}-${licensePlate || 'Unknown'}\\``
    (task.ts:261-263). Note the asymmetry kept faithfully: the state
    fallback inside the template is ``??`` (NULL only), the plate is
    ``||`` (NULL or empty)."""
    n = F.col(name) if isinstance(name, str) else name
    st = F.col(license_state) if isinstance(license_state, str) else license_state
    pl = F.col(license_plate) if isinstance(license_plate, str) else license_plate
    fallback = F.concat_ws("-", F.coalesce(st, F.lit("US")), js_coalesce(pl, "Unknown"))
    return F.when(n.isNull() | (n == F.lit("")), fallback).otherwise(n)


def kmh_to_ms(speed_kmh: Column | str) -> Column:
    """km/h → m/s (task.ts:276)."""
    c = F.col(speed_kmh) if isinstance(speed_kmh, str) else speed_kmh
    return c * F.lit(KMH_TO_MS)


def surrogate_key(prefix: str, key: Column | str) -> Column:
    """Stable surrogate id, e.g. 'geotab-' + device id (task.ts:270)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.concat(F.lit(prefix), c.cast("string"))


def geojson_point(longitude: Column | str, latitude: Column | str) -> Column:
    """GeoJSON Point struct `{type:'Point', coordinates:[lon,lat]}`
    (task.ts:279-282)."""
    lon = F.col(longitude) if isinstance(longitude, str) else longitude
    lat = F.col(latitude) if isinstance(latitude, str) else latitude
    return F.struct(
        F.lit("Point").alias("type"),
        F.array(lon.cast("double"), lat.cast("double")).alias("coordinates"),
    )


def haversine_km(
    lat1: Column | str, lon1: Column | str, lat2: Column | str, lon2: Column | str
) -> Column:
    """Great-circle distance in km, composed from built-in math functions
    so it runs inside codegen (SURVEY.md §2 P15)."""
    to_col = lambda c: F.col(c) if isinstance(c, str) else c  # noqa: E731
    la1, lo1, la2, lo2 = (F.radians(to_col(c)) for c in (lat1, lon1, lat2, lon2))
    dlat = la2 - la1
    dlon = lo2 - lo1
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(la1) * F.cos(la2) * F.pow(F.sin(dlon / 2), 2)
    return F.lit(2 * 6371.0088) * F.asin(F.sqrt(a))
