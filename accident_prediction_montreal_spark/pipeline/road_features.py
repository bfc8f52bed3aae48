"""Road features: street length, level, type (reference
road_network.py:47-100 + assign_street_type :327-365).

Differences from the reference, both Spark-first:
  * street length (max pairwise point distance) keeps the reference's
    self-join shape (J3/A3) but haversine_meters is applied once, not in
    two half-formulas;
  * the street-type keyword classifier is a MapType literal lookup on
    the first word — JVM-side `element_at`, replacing the reference's
    row-at-a-time Python UDF (F1). Same keyword table, same
    first-word-only semantics.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.functions.geo import haversine_meters

# Keyword → type table from reference road_network.py:330-362.
_ASSIGNATION = {
    "allée": ["allée"],
    "autoroute": ["autoroute"],
    "avenue": ["avenue"],
    "boulevard": ["boulevard"],
    "carré": ["carré"],
    "square": ["square"],
    "carref.": ["carref."],
    "chemin": ["chemin"],
    "circle": ["circle", "cercle"],
    "côte": ["côte"],
    "cours": ["cours"],
    "court": ["court"],
    "crescent": ["crescent", "croissant"],
    "drive": ["drive"],
    "esplanade": ["esplanade"],
    "island": ["île"],
    "impasse": ["impasse"],
    "lane": ["lane"],
    "lieu": ["lieu"],
    "montée": ["montée"],
    "park": ["parc", "park"],
    "passage": ["passage"],
    "place": ["place"],
    "pont": ["pont"],
    "promenade": ["promenade"],
    "rang": ["rang"],
    "road": ["road", "route"],
    "ruelle": ["ruelle"],
    "street": ["street", "rue"],
    "terrasse": ["terrasse"],
}

_KEYWORD_TO_TYPE = {kw: st for st, kws in _ASSIGNATION.items() for kw in kws}


def street_type_expr(street_name: Column | str) -> Column:
    """Street type from the first word of the name; null when unknown."""
    street_name = F.col(street_name) if isinstance(street_name, str) else street_name
    first_word = F.lower(F.split(street_name, " ")[0])
    mapping = F.create_map(*chain.from_iterable((F.lit(k), F.lit(v)) for k, v in _KEYWORD_TO_TYPE.items()))
    return F.element_at(mapping, first_word)


def road_features(road_points: DataFrame) -> DataFrame:
    """(street_id, street_level, street_length, loc_lat, loc_long, street_type).

    Length = max pairwise haversine between the street's points — the
    reference's O(p²)-per-street self-join (road_network.py:57-82). The
    join key is street_id so each street's points stay co-located.
    """
    left = road_points.select(
        "street_id", "street_type", "street_name", "coord_lat", "coord_long",
        "center_lat", "center_long",
    )
    right = road_points.select(
        "street_id",
        F.col("coord_lat").alias("coord2_lat"),
        F.col("coord_long").alias("coord2_long"),
    )
    return (
        left.join(right, "street_id")
        .withColumn(
            "pair_dist",
            haversine_meters("coord_lat", "coord_long", "coord2_lat", "coord2_long"),
        )
        .groupBy("street_id", "street_type", "street_name", "center_lat", "center_long")
        .agg(F.max("pair_dist").alias("street_length"))
        .select(
            "street_id",
            F.col("street_type").alias("street_level"),
            "street_length",
            F.col("center_lat").alias("loc_lat"),
            F.col("center_long").alias("loc_long"),
            street_type_expr("street_name").alias("street_type"),
        )
        .distinct()
    )
