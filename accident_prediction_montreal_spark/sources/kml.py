"""KML/KMZ road-network source (SURVEY.md §2 S4).

The reference parallelizes 64 KMZ files, unzips each on an executor and
BeautifulSoup-parses the KML into (street_name, street_type, center,
coord, nid) rows — its only RDD stage (reference road_network.py:103-264,
287). This engine keeps the same shape — the raw-bytes → rows boundary
is genuinely per-file imperative work — but parses with the stdlib
``xml.etree`` and declares the output schema explicitly.

At scale the file list is the parallelism unit: ``parallelize(paths,
len(paths))`` gives one task per archive, and everything after
``toDF`` is columnar.
"""

from __future__ import annotations

import io
import re
import xml.etree.ElementTree as ET
import zipfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

ROAD_SCHEMA = T.StructType(
    [
        T.StructField("street_name", T.StringType()),
        T.StructField("street_type", T.StringType()),
        T.StructField("center_long", T.DoubleType()),
        T.StructField("center_lat", T.DoubleType()),
        T.StructField("coord_long", T.DoubleType()),
        T.StructField("coord_lat", T.DoubleType()),
        T.StructField("nid", T.StringType()),
    ]
)

_NS = re.compile(r"\{.*\}")


def _tag(el) -> str:
    return _NS.sub("", el.tag)


def parse_kml_bytes(data: bytes) -> list[tuple]:
    """KML document → (name, folder-type, center_lon, center_lat, lon, lat, nid) rows.

    A Placemark's LineString coordinates become one row per point, with
    the polyline's midpoint repeated as the center (the reference derives
    centers the same way: road_network.py:232-243). Folder name plays the
    role of the road-class ("street_type" pre-UDF) column.
    """
    rows: list[tuple] = []
    root = ET.fromstring(data)

    def walk(el, folder_name):
        for child in el:
            tag = _tag(child)
            if tag == "Folder":
                name_el = next((c for c in child if _tag(c) == "name"), None)
                walk(child, name_el.text if name_el is not None else folder_name)
            elif tag == "Placemark":
                name, nid, coords = None, None, []
                for c in child.iter():
                    t = _tag(c)
                    if t == "name" and name is None:
                        name = (c.text or "").strip()
                    elif t == "SimpleData" and c.get("name") == "NID":
                        nid = (c.text or "").strip()
                    elif t == "coordinates" and c.text:
                        for triple in c.text.split():
                            parts = triple.split(",")
                            if len(parts) >= 2:
                                coords.append((float(parts[0]), float(parts[1])))
                if coords:
                    c_lon, c_lat = coords[len(coords) // 2]
                    for lon, lat in coords:
                        rows.append((name, folder_name, c_lon, c_lat, lon, lat, nid))
            else:
                walk(child, folder_name)

    walk(root, None)
    return rows


def _read_archive(path: str) -> list[tuple]:
    raw = Path(path).read_bytes()
    if path.endswith(".kmz") or raw[:2] == b"PK":
        with zipfile.ZipFile(io.BytesIO(raw)) as z:
            kml_names = [n for n in z.namelist() if n.endswith(".kml")]
            out: list[tuple] = []
            for n in kml_names:
                out.extend(parse_kml_bytes(z.read(n)))
            return out
    return parse_kml_bytes(raw)


def read_road_network(spark: SparkSession, paths: list[str]) -> DataFrame:
    """(street, point) DataFrame from KML/KMZ files, with unique street_id.

    street_id = nid + per-nid polyline ordinal, matching the reference's
    concat(nid, row_number) disambiguation of duplicate nids
    (road_network.py:290-297).
    """
    sc = spark.sparkContext
    rdd = sc.parallelize(paths, max(len(paths), 1)).flatMap(_read_archive)
    df = spark.createDataFrame(rdd, ROAD_SCHEMA)
    w = Window.partitionBy("nid", "center_long", "center_lat").orderBy("coord_long", "coord_lat")
    nid_poly = (
        df.select("nid", "center_long", "center_lat")
        .dropDuplicates()
        .withColumn(
            "poly_ord",
            F.row_number().over(
                Window.partitionBy("nid").orderBy("center_long", "center_lat")
            ),
        )
    )
    return (
        df.join(nid_poly, ["nid", "center_long", "center_lat"])
        .withColumn("street_id", F.concat_ws("_", "nid", "poly_ord"))
        .drop("poly_ord")
    )
