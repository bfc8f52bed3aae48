"""CDC / MERGE-INTO upsert application (X-surface extension).

The reference rebuilds its caches wholesale (utils.py:17-30 reads or
recomputes an entire parquet workdir); a 100-TB table cannot be rebuilt
when a day of changes lands — you apply a change stream: for every key,
the latest change wins, a delete removes the key, an upsert replaces
the payload, untouched base rows pass through.

Scale shape: ONE groupBy on the change stream (``max_by`` over an
ordering struct — map-side combinable, so each shuffle partition ships
one row per key, never the key's whole history) plus ONE full-outer
join against the base snapshot on the merge key. No windows (a
row_number over the history would sort every version), no driver
state. At 100 TB both sides hash-partition on the key; if the base is
bucketed by key the join is exchange-free on that side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_change_per_key(
    changes: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    payload_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Collapse a change stream to its last-writer-wins row per key.

    ``order_cols`` is the total order (e.g. ``(ts, change_id)`` — make
    it total, or last-writer is nondeterministic). Implemented as
    ``max_by(struct(payload+op), struct(order))``: a decomposable
    aggregate, so Spark combines map-side and the shuffle carries one
    candidate per (partition, key).
    """
    picked = F.max_by(
        F.struct(*[F.col(c) for c in [*payload_cols, op_col]]),
        F.struct(*[F.col(c) for c in order_cols]),
    ).alias("__c")
    flat = [F.col(f"__c.{c}").alias(c) for c in [*payload_cols, op_col]]
    return changes.groupBy(*key_cols).agg(picked).select(*key_cols, *flat)


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    payload_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """MERGE the change stream into the base snapshot.

    Semantics (ANSI MERGE with last-writer-wins source dedup):
      * key only in base            -> base row survives unchanged
      * latest change is ``delete`` -> key disappears (even if new)
      * otherwise                   -> latest change's payload wins

    Returns key + payload + ``src`` ('base'|'upsert') so callers can
    audit how many rows each branch produced.
    """
    latest = latest_change_per_key(changes, key_cols, order_cols, payload_cols, op_col)
    b = base.select(*key_cols, *[F.col(c).alias(f"__b_{c}") for c in payload_cols])
    merged = b.join(latest, on=list(key_cols), how="full_outer")
    alive = merged.filter(
        F.col(op_col).isNull() | (F.col(op_col) != F.lit(delete_op))
    )
    took_change = F.col(op_col).isNotNull()
    out_payload = [
        F.when(took_change, F.col(c)).otherwise(F.col(f"__b_{c}")).alias(c)
        for c in payload_cols
    ]
    src = F.when(took_change, F.lit("upsert")).otherwise(F.lit("base")).alias("src")
    return alive.select(*key_cols, *out_payload, src)
