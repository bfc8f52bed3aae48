"""Shared snapshot-B fixture for the incremental-pipeline story.

llm_corpus_diff, llm_index_maintenance, llm_embedding_refresh and
st_corpus_diff_stream all derive corpus version B from version A with
the SAME planted delta — every 41st doc's text revised, every 43rd
dropped, every 47th re-added under a fresh id — so the four queries
tell one story and their oracles share one definition. This module is
the single source of truth for the builder (Spark + DuckDB mirror), so
the fixture cannot drift between the four call sites.

The re-add id shift is ``1 << 40``: corpus_diff documents a unique-id
precondition, and a small constant shift (the original 300000) would
COLLIDE with real doc_ids once the corpus exceeds it — silently
planting duplicate ids in B at larger scale factors. A power-of-two
far above any supported sf's id range keeps the precondition holding
by construction (documents ids are dense from 0; 2^40 docs is ~1000x
the 100 TB design corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: re-add id offset — provably above any real doc_id at any supported sf
REID_SHIFT = 1 << 40


def snapshot_b(docs: DataFrame) -> DataFrame:
    """Corpus version B from version A (columns ``doc_id, text``)."""
    return (
        docs.filter(F.col("doc_id") % 41 == 0)
        .select("doc_id", F.concat(F.col("text"), F.lit(" [rev2]")).alias("text"))
        .unionByName(
            docs.filter(
                (F.col("doc_id") % 41 != 0) & (F.col("doc_id") % 43 != 0)
            ).select("doc_id", "text")
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 47 == 0).select(
                (F.col("doc_id") + REID_SHIFT).alias("doc_id"), "text"
            )
        )
    )


#: DuckDB mirror of :func:`snapshot_b` (SELECT doc_id, text ...)
SQL_SNAPSHOT_B = f"""
      SELECT doc_id, text || ' [rev2]' AS text
      FROM documents WHERE doc_id % 41 = 0
      UNION ALL
      SELECT doc_id, text FROM documents
      WHERE doc_id % 41 <> 0 AND doc_id % 43 <> 0
      UNION ALL
      SELECT doc_id + {REID_SHIFT}, text FROM documents WHERE doc_id % 47 = 0
"""
