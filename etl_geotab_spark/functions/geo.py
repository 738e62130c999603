"""Geofence containment expressions (reference-domain extension).

The reference emits GeoJSON Point features (task.ts:279-282); the
canonical downstream geo operation on a fleet feed is geofencing —
"which vehicles are inside an operational zone". For CONVEX zones the
point-in-polygon test unrolls to pure arithmetic: with vertices in
counter-clockwise order, p is inside iff every edge cross product
(v2-v1) × (p-v1) is ≥ 0. That makes containment a MAP-ONLY projection
(no join, no UDF, whole-stage codegen) whose per-row cost is
edges × 4 multiplications — the shape you want when testing 10¹¹ GPS
points against a zone set — and, because it is plain *,+,- arithmetic,
bit-identical across engines (oracle-checkable, unlike libm-backed
haversine predicates).

Zones with many polygons scale by composing this with a coarse grid
bucket join (see q_grid_spatial_join) to prune candidate zones first;
the per-pair verify stays this same expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def point_in_convex_polygon(
    lat: Column, lon: Column, vertices: list[tuple[float, float]]
) -> Column:
    """Boolean containment of (lat, lon) in the convex polygon given as
    [(lat, lon), ...] in counter-clockwise order. Boundary counts as
    inside (cross product 0)."""
    if len(vertices) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    conds = []
    n = len(vertices)
    for i in range(n):
        y1, x1 = vertices[i]
        y2, x2 = vertices[(i + 1) % n]
        # (x2-x1)*(lat-y1) - (y2-y1)*(lon-x1) >= 0  — vertex deltas fold
        # to literals so each edge is 2 mults + 2 subs at runtime
        cross = F.lit(x2 - x1) * (lat - F.lit(y1)) - F.lit(y2 - y1) * (
            lon - F.lit(x1)
        )
        conds.append(cross >= 0)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def polygon_sql_predicate(
    lat_expr: str, lon_expr: str, vertices: list[tuple[float, float]]
) -> str:
    """The SAME containment test as ANSI SQL text (for oracle pairing):
    identical literal deltas, identical multiply/subtract shape, so a
    scalar engine evaluates it bit-identically."""
    terms = []
    n = len(vertices)
    for i in range(n):
        y1, x1 = vertices[i]
        y2, x2 = vertices[(i + 1) % n]
        terms.append(
            f"(({x2 - x1!r}) * ({lat_expr} - ({y1!r})) - "
            f"({y2 - y1!r}) * ({lon_expr} - ({x1!r})) >= 0)"
        )
    return "(" + " AND ".join(terms) + ")"
