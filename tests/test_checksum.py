"""operators/checksum.py — O(1)-row multiset equality contracts.

The checksum replaces corpus-width symmetric anti-joins in the trilogy
verify stages (llm_index_maintenance, llm_embedding_refresh); these
tests pin that it agrees with the anti-join form on equal inputs and
detects every planted divergence class the anti-join would have caught.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from accident_prediction_montreal_spark.operators.checksum import (
    checksum_equal_fact,
    multiset_checksum,
)


def _fact(spark, a_rows, b_rows, schema="k LONG, v STRING"):
    a = spark.createDataFrame(a_rows, schema) if a_rows else (
        spark.createDataFrame([], schema)
    )
    b = spark.createDataFrame(b_rows, schema) if b_rows else (
        spark.createDataFrame([], schema)
    )
    row = checksum_equal_fact(a, b, ["k", "v"], "eq").collect()[0]
    assert row["facet"] == "eq"
    return row["n"]


def test_equal_multisets_any_order_and_layout(spark):
    rows = [(1, "a"), (2, "b"), (3, "c"), (3, "c")]  # duplicate kept twice
    a = spark.createDataFrame(rows, "k LONG, v STRING").repartition(4)
    b = spark.createDataFrame(list(reversed(rows)), "k LONG, v STRING").coalesce(1)
    assert checksum_equal_fact(a, b, ["k", "v"], "eq").collect()[0]["n"] == 1
    # ... and the checksum row itself is layout-invariant
    assert (
        multiset_checksum(a, ["k", "v"]).collect()
        == multiset_checksum(b, ["k", "v"]).collect()
    )


def test_detects_single_row_divergence(spark):
    base = [(i, f"v{i}") for i in range(50)]
    changed = list(base)
    changed[17] = (17, "DIVERGED")
    assert _fact(spark, base, changed) == 0


def test_detects_multiplicity_change(spark):
    # xor alone cancels even multiplicities — count+sum must catch it.
    base = [(1, "a"), (2, "b")]
    doubled = [(1, "a"), (1, "a"), (2, "b")]
    assert _fact(spark, base, doubled) == 0
    # same count, one row swapped for a duplicate of another
    swapped = [(1, "a"), (1, "a")]
    assert _fact(spark, [(1, "a"), (2, "b")], swapped) == 0


def test_detects_missing_and_extra_rows(spark):
    base = [(i, "x") for i in range(10)]
    assert _fact(spark, base, base[:-1]) == 0
    assert _fact(spark, base, base + [(99, "x")]) == 0


def test_empty_inputs_null_safe(spark):
    assert _fact(spark, [], []) == 1
    assert _fact(spark, [(1, "a")], []) == 0
    assert _fact(spark, [], [(1, "a")]) == 0


def test_null_valued_columns_hash_consistently(spark):
    rows = [(1, None), (2, "b")]
    assert _fact(spark, rows, list(reversed(rows))) == 1
    assert _fact(spark, rows, [(1, "a"), (2, "b")]) == 0


def test_agrees_with_anti_join_form_on_band_index(spark):
    # The r11 verify form (symmetric anti-joins) and the checksum must
    # give the same verdict on the real index shape, both directions.
    from accident_prediction_montreal_spark.operators.dedup import banded_signatures

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc {i} tail words") for i in range(12)],
        ["doc_id", "text"],
    )
    bands = ["doc", "band_id", "band_hash"]
    idx = banded_signatures(docs).select(*bands)
    idx2 = banded_signatures(docs).select(*bands).repartition(7)

    def anti(a, b):
        return (
            a.join(b, bands, "left_anti")
            .unionByName(b.join(a, bands, "left_anti"))
            .count()
            == 0
        )

    assert anti(idx, idx2)
    assert checksum_equal_fact(idx, idx2, bands, "eq").collect()[0]["n"] == 1

    # plant a 1-row divergence: drop one band row
    broken = idx2.filter(~((F.col("doc") == 3) & (F.col("band_id") == 0)))
    assert not anti(idx, broken)
    assert checksum_equal_fact(idx, broken, bands, "eq").collect()[0]["n"] == 0
