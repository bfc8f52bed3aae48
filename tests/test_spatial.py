"""kNN join (both forms) and IDW interpolation on engineered geometries."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from accident_prediction_montreal_spark.operators.spatial import (
    idw_interpolate,
    knn_join,
    knn_join_grid,
)


def _points(spark):
    # One query point; four sites at increasing longitude offsets east.
    left = spark.createDataFrame([(1, 45.5, -73.6)], ["id", "lat", "lon"])
    right = spark.createDataFrame(
        [(10, 45.5, -73.6001), (20, 45.5, -73.6005), (30, 45.5, -73.61), (40, 45.5, -73.7)],
        ["rid", "rlat", "rlon"],
    )
    return left, right


def test_knn_join_orders_by_distance(spark):
    left, right = _points(spark)
    out = knn_join(left, right, k=3).orderBy("knn_rank").collect()
    assert [r["rid"] for r in out] == [10, 20, 30]
    assert out[0]["distance_m"] < out[1]["distance_m"] < out[2]["distance_m"]
    # ~0.0001° of longitude at 45.5°N ≈ 7.8 m
    assert abs(out[0]["distance_m"] - 7.8) < 0.5


def test_knn_join_tie_break_deterministic(spark):
    left = spark.createDataFrame([(1, 0.0, 0.0)], ["id", "lat", "lon"])
    # Two sites exactly equidistant (mirror east/west): lower rid wins.
    right = spark.createDataFrame(
        [(7, 0.0, 0.001), (3, 0.0, -0.001)], ["rid", "rlat", "rlon"]
    )
    out = knn_join(left, right, k=2).orderBy("knn_rank").collect()
    assert [r["rid"] for r in out] == [3, 7]


def test_knn_grid_matches_crossjoin(spark):
    left, right = _points(spark)
    a = {(r["id"], r["rid"], r["knn_rank"]) for r in knn_join(left, right, k=3).collect()}
    b = {
        (r["id"], r["rid"], r["knn_rank"])
        for r in knn_join_grid(left, right, k=3, cell_deg=0.5).collect()
    }
    assert a == b


def test_knn_grid_cell_boundary(spark):
    # Query at a cell's west edge; neighbor lives one cell west — caught
    # only because right points replicate into neighbor cells.
    left = spark.createDataFrame([(1, 45.0, 10.0)], ["id", "lat", "lon"])
    right = spark.createDataFrame([(5, 45.0, 9.9999)], ["rid", "rlat", "rlon"])
    out = knn_join_grid(left, right, k=1, cell_deg=0.1).collect()
    assert len(out) == 1 and out[0]["rid"] == 5


def test_idw_weighted_average_hand_computed(spark):
    # Stations due east at 0.001° and 0.002° on the equator: distances d
    # and 2d ⇒ weights 1/d² and 1/4d² ⇒ IDW = (4·v1 + v2)/5.
    samples = spark.createDataFrame([(1, 0.0, 0.0)], ["sample_id", "lat", "lon"])
    stations = spark.createDataFrame(
        [(1, 0.0, 0.001, 10.0), (2, 0.0, 0.002, 50.0)],
        ["station_id", "station_lat", "station_lon", "v"],
    )
    out = idw_interpolate(samples, stations, ["v"]).first()
    assert abs(out["v"] - (4 * 10.0 + 50.0) / 5.0) < 1e-6


def test_idw_nan_masked(spark):
    # NaN station must contribute to neither numerator nor denominator.
    samples = spark.createDataFrame([(1, 0.0, 0.0)], ["sample_id", "lat", "lon"])
    stations = spark.createDataFrame(
        [(1, 0.0, 0.001, 10.0), (2, 0.0, 0.002, float("nan"))],
        ["station_id", "station_lat", "station_lon", "v"],
    )
    out = idw_interpolate(samples, stations, ["v"]).first()
    assert out["v"] == 10.0


def test_idw_all_nan_gives_null(spark):
    samples = spark.createDataFrame([(1, 0.0, 0.0)], ["sample_id", "lat", "lon"])
    stations = spark.createDataFrame(
        [(1, 0.0, 0.001, float("nan"))],
        ["station_id", "station_lat", "station_lon", "v"],
    )
    out = idw_interpolate(samples, stations, ["v"]).first()
    assert out["v"] is None


def test_knn_join_quadratic_guard(spark):
    import pytest

    left, right = _points(spark)
    with pytest.raises(ValueError, match="knn_join_grid"):
        knn_join(left, right, k=2, max_broadcast_rows=3)
    # opting out restores the verification-baseline behavior
    assert knn_join(left, right, k=2, max_broadcast_rows=None).count() == 2


def test_embedding_pairs_quadratic_guard(spark):
    import pytest

    from accident_prediction_montreal_spark.operators.similarity import (
        embedding_cosine_pairs,
    )

    df = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(5)], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    with pytest.raises(ValueError, match="brp_lsh_ann"):
        embedding_cosine_pairs(df, threshold=0.9, max_rows=4)
    assert embedding_cosine_pairs(df, threshold=0.9, max_rows=None).count() == 10


def test_estimate_cell_deg_grid_matches_exhaustive(spark):
    """Property-style: at the estimated cell size, the grid path equals the
    exhaustive crossJoin on seeded uniform clouds (several densities)."""
    import random

    from accident_prediction_montreal_spark.operators.spatial import (
        estimate_cell_deg,
    )

    for seed, n_right in ((1, 120), (2, 400)):
        rng = random.Random(seed)
        right = spark.createDataFrame(
            [
                (i, 45.4 + rng.random() * 0.2, -73.7 + rng.random() * 0.3)
                for i in range(n_right)
            ],
            ["rid", "rlat", "rlon"],
        )
        left = spark.createDataFrame(
            [
                (i, 45.4 + rng.random() * 0.2, -73.7 + rng.random() * 0.3)
                for i in range(25)
            ],
            ["id", "lat", "lon"],
        )
        k = 3
        cell = estimate_cell_deg(right, k)
        got = {
            (r["id"], r["rid"], r["knn_rank"])
            for r in knn_join_grid(left, right, k=k, cell_deg=cell).collect()
        }
        want = {
            (r["id"], r["rid"], r["knn_rank"])
            for r in knn_join(left, right, k=k).collect()
        }
        assert got == want, f"seed={seed}: grid(cell={cell}) != exhaustive"


def test_estimate_cell_deg_scales_with_density(spark):
    from accident_prediction_montreal_spark.operators.spatial import (
        estimate_cell_deg,
    )

    import random

    rng = random.Random(3)
    mk = lambda n: spark.createDataFrame(  # noqa: E731
        [(i, 45.0 + rng.random(), -73.0 + rng.random()) for i in range(n)],
        ["rid", "rlat", "rlon"],
    )
    sparse, dense = estimate_cell_deg(mk(100), 3), estimate_cell_deg(mk(1600), 3)
    assert dense < sparse  # 16x density → ~4x smaller cells
