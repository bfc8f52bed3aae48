"""Point-in-polygon containment join (J-surface, spatial family).

The reference consumes polygon zones from KML (road_network.py reads
kml placemarks; our sources/kml.py parses them) but only ever uses
point-to-point distance. Real geo pipelines assign points to zones —
a containment JOIN. Semantics: even-odd (ray casting) rule, the same
rule KML/GeoJSON renderers use.

Scale shape (mirrors the kNN grid join in operators/spatial.py):
  1. each polygon's bounding box is exploded onto a coarse grid —
     O(polygons × bbox cells), tiny;
  2. points bucket to their single cell and equi-join the grid —
     the ONLY data-sized shuffle, and it's a hash join on an int pair;
  3. surviving (point, polygon) candidates join the polygon's edge
     list and one map-side-combinable aggregate counts ray crossings;
     parity decides containment.
A point is never compared to a polygon whose bbox grid it doesn't
touch, so cost is data × local polygon density, not data × polygons.
Correctness does not depend on the grid: any point inside a polygon is
inside its bbox, hence bucketed into a covered cell.

Crossing test for edge (x1,y1)-(x2,y2) and point (px,py):
  (y1 > py) != (y2 > py)  AND  px < x1 + (py-y1)*(x2-x1)/(y2-y1)
— the standard even-odd formulation; identical IEEE expression on the
oracle side, so parity is bit-exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_polygon_join(
    points: DataFrame,
    edges: DataFrame,
    cell_size: float,
    point_id: str = "pid",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """(pid, x, y, poly_id) for every point strictly inside a polygon
    by the even-odd rule.

    ``edges``: (poly_id, x1, y1, x2, y2) — one row per polygon edge,
    closed ring (last vertex connects back to the first).
    """
    cs = F.lit(cell_size)
    bbox = edges.groupBy("poly_id").agg(
        F.floor(F.least(F.min("x1"), F.min("x2")) / cs).alias("cx_lo"),
        F.floor(F.greatest(F.max("x1"), F.max("x2")) / cs).alias("cx_hi"),
        F.floor(F.least(F.min("y1"), F.min("y2")) / cs).alias("cy_lo"),
        F.floor(F.greatest(F.max("y1"), F.max("y2")) / cs).alias("cy_hi"),
    )
    cells = bbox.select(
        "poly_id",
        F.explode(F.sequence("cx_lo", "cx_hi")).alias("cx"),
        F.col("cy_lo"),
        F.col("cy_hi"),
    ).select(
        "poly_id", "cx", F.explode(F.sequence("cy_lo", "cy_hi")).alias("cy")
    )
    pts = points.select(
        F.col(point_id).alias("pid"),
        F.col(x).alias("px"),
        F.col(y).alias("py"),
        F.floor(F.col(x) / cs).alias("cx"),
        F.floor(F.col(y) / cs).alias("cy"),
    )
    # polygons are few: the cell table broadcasts; the point side never shuffles
    cand = pts.join(F.broadcast(cells), on=["cx", "cy"]).select("pid", "px", "py", "poly_id")

    crosses = (
        ((F.col("y1") > F.col("py")) != (F.col("y2") > F.col("py")))
        & (
            F.col("px")
            < F.col("x1")
            + (F.col("py") - F.col("y1"))
            * (F.col("x2") - F.col("x1"))
            / (F.col("y2") - F.col("y1"))
        )
    ).cast("long")
    return (
        cand.join(F.broadcast(edges), on="poly_id")
        .groupBy("pid", "px", "py", "poly_id")
        .agg(F.sum(crosses).alias("__crossings"))
        .filter(F.col("__crossings") % 2 == 1)
        .select(
            F.col("pid"),
            F.col("px").alias("x"),
            F.col("py").alias("y"),
            "poly_id",
        )
    )


def demo_polygons(n_polys: int = 8, seed: int = 7) -> list[tuple[int, float, float, float, float]]:
    """Deterministic closed-ring edge lists in the [0,10)² plane:
    (poly_id, x1, y1, x2, y2), vertices rounded to 4 decimals so the
    identical literals can be inlined into an ANSI oracle."""
    import math

    edges: list[tuple[int, float, float, float, float]] = []
    for p in range(n_polys):
        cx = 1.4 + (p % 4) * 2.4
        cy = 2.0 + (p // 4) * 4.6
        n_vert = 5 + (p % 3)
        r = 0.9 + 0.13 * ((p * seed) % 5)
        verts = []
        for i in range(n_vert):
            ang = 2 * math.pi * i / n_vert + 0.37 * p
            rr = r * (1.0 + 0.22 * math.sin(seed * i + p))
            verts.append(
                (round(cx + rr * math.cos(ang), 4), round(cy + rr * math.sin(ang), 4))
            )
        for i in range(n_vert):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % n_vert]
            edges.append((p, x1, y1, x2, y2))
    return edges
