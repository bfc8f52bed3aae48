"""Wave-11 queries (r11): the remaining LLM-curation staples —
deterministic training-shuffle shard materialization (the global
permutation every pretraining run consumes), the snapshot-delta
trilogy completions driven by llm_corpus_diff (incremental LSH-index
MAINTENANCE: delta-apply == full rebuild with signatures computed only
for the delta; incremental EMBEDDING REFRESH: carry unchanged vectors,
re-encode only the delta; and the streaming digest CHANGE FILTER that
suppresses no-op upserts statefully with a full value oracle), and URL
canonicalization + variant dedup (the first normalization pass of a
web corpus). Value oracles where ANSI-expressible; the xxhash/stub
equality contracts are Spark-verified literal-1 checks beside
SQL-exact per-status row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.operators.checksum import (
    checksum_equal_fact,
)
from accident_prediction_montreal_spark.plans.registry import register
from accident_prediction_montreal_spark.plans.snapshot_fixture import (
    SQL_SNAPSHOT_B as _SQL_SNAPSHOT_B,
)
from accident_prediction_montreal_spark.plans.snapshot_fixture import snapshot_b
from accident_prediction_montreal_spark.sources.registry import load_table

_N_SHARDS = 16
_SHARD_SALT = 5


def _shuffle_shards_oracle() -> str:
    from accident_prediction_montreal_spark.operators.mixing import lcg_uniform_sql

    u = lcg_uniform_sql("doc_id", salt=_SHARD_SALT)
    return f"""
    WITH keyed AS (
      SELECT doc_id, n_chars, {u} AS u,
        CAST(LEAST(FLOOR({u} * {_N_SHARDS}), {_N_SHARDS - 1}) AS BIGINT)
          AS shard_id
      FROM documents
    ),
    pos AS (
      SELECT shard_id, doc_id, n_chars,
        ROW_NUMBER() OVER (PARTITION BY shard_id ORDER BY u, doc_id) AS p
      FROM keyed
    )
    SELECT shard_id,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(doc_id) AS BIGINT) AS id_sum,
      CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
      CAST(SUM(p * doc_id) AS BIGINT) AS perm_checksum
    FROM pos GROUP BY shard_id ORDER BY shard_id
    """


@register(
    "llm_shuffle_shards",
    oracle=None,  # set below: needs lcg_uniform_sql at import time
    description="TRAINING-SHUFFLE SHARD MATERIALIZATION — the global "
    "deterministic permutation every pretraining run consumes: each "
    "document draws a seeded LCG uniform (operators/mixing.lcg_uniform, "
    f"salt {_SHARD_SALT}), shard_id = floor(u * {_N_SHARDS}) assigns it "
    "to one of "
    f"{_N_SHARDS} shards WITHOUT a global sort (uniform u ==> balanced "
    "shards in expectation; the rank-free assignment is the 100-TB "
    "design — NTILE-style exact balance would demand a total order "
    "over the corpus), and the within-shard training order is "
    "(u, doc_id). Output pins the BYTE ORDER, not just membership: "
    "per-shard counts/id/char sums plus a position-weighted checksum "
    "sum(pos * doc_id) over the within-shard rank — any transposition "
    "anywhere changes it. Plan: one shuffle keyed by shard_id (the "
    "same exchange the shard WRITE pays; writers chain "
    ".repartition(shard_id).sortWithinPartitions(u) into a partitioned "
    "sink — the S3 partitioned-write path), window + aggregate reuse "
    "that partitioning with no further exchange. Post-shuffle "
    "parallelism == n_shards and each task sorts one shard, so the "
    "shard count is a function of CORPUS size, not cluster size: pick "
    "shards of a few hundred MB (1e4-1e6 shards at 100 TB — exactly "
    "why real training corpora ship as many small shard files); the "
    "fixture's 16 matches the gate scale. Oracle: identical "
    "seeded assignment + window in DuckDB via the shared "
    "lcg_uniform_sql generator.",
)
def llm_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from accident_prediction_montreal_spark.operators.mixing import lcg_uniform

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "n_chars")
    u = lcg_uniform(F.col("doc_id"), salt=_SHARD_SALT)
    keyed = docs.select(
        "doc_id",
        "n_chars",
        u.alias("u"),
        F.least(F.floor(u * _N_SHARDS), F.lit(_N_SHARDS - 1))
        .cast("long")
        .alias("shard_id"),
    )
    w = Window.partitionBy("shard_id").orderBy("u", "doc_id")
    pos = keyed.withColumn("p", F.row_number().over(w))
    return (
        pos.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.sum("n_chars").cast("long").alias("chars_sum"),
            F.sum(F.col("p") * F.col("doc_id"))
            .cast("long")
            .alias("perm_checksum"),
        )
        .orderBy("shard_id")
    )


from accident_prediction_montreal_spark.plans.registry import (  # noqa: E402
    REGISTRY as _REG,
)
from accident_prediction_montreal_spark.plans.registry import (  # noqa: E402
    QuerySpec as _QS,
)

_REG["llm_shuffle_shards"] = _QS(
    fn=_REG["llm_shuffle_shards"].fn,
    oracle=_shuffle_shards_oracle(),
    description=_REG["llm_shuffle_shards"].description,
)


# --- incremental index maintenance -------------------------------------------

# Snapshot B: the SAME planted revision as llm_corpus_diff, shared via
# plans/snapshot_fixture (single source of truth for the Spark builder
# and the DuckDB mirror) so the four incremental-pipeline queries tell
# one story and the fixture cannot drift between call sites.

# A doc contributes LSH band rows iff it has at least one word 3-gram
# shingle, i.e. >= 3 whitespace tokens (operators/dedup.py:
# word_shingle_hashes -> explode drops empty shingle arrays). 8 bands
# per indexed doc (num_hashes=32 / bands=8 defaults).
_SQL_HAS_SHINGLES = (
    "len(CASE WHEN text IS NULL OR trim(lower(text)) = '' "
    "THEN CAST([] AS VARCHAR[]) "
    "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END) >= 3"
)


def _index_maintenance_oracle() -> str:
    return f"""
    WITH b AS ({_SQL_SNAPSHOT_B}),
    d AS (
      SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
        CASE
          WHEN a.doc_id IS NULL THEN 'added'
          WHEN b.doc_id IS NULL THEN 'removed'
          WHEN md5(a.text) IS DISTINCT FROM md5(b.text) THEN 'changed'
          ELSE 'unchanged'
        END AS status
      FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    ),
    counts AS (SELECT status, COUNT(*) AS n FROM d GROUP BY status),
    facts AS (
      SELECT 'docs_' || status AS facet, CAST(n AS BIGINT) AS n FROM counts
      UNION ALL
      SELECT 'rows_deleted', CAST(8 * COUNT(*) AS BIGINT)
      FROM documents a JOIN d USING (doc_id)
      WHERE d.status IN ('removed', 'changed') AND {_SQL_HAS_SHINGLES}
      UNION ALL
      SELECT 'rows_inserted', CAST(8 * COUNT(*) AS BIGINT)
      FROM b JOIN d USING (doc_id)
      WHERE d.status IN ('added', 'changed') AND {_SQL_HAS_SHINGLES}
      UNION ALL
      SELECT 'rows_final', CAST(8 * COUNT(*) AS BIGINT)
      FROM b WHERE {_SQL_HAS_SHINGLES}
      UNION ALL
      SELECT 'delta_equals_rebuild', CAST(1 AS BIGINT)
    )
    SELECT facet, n FROM facts ORDER BY facet
    """


@register(
    "llm_index_maintenance",
    oracle=None,  # set below (composed SQL)
    description="INCREMENTAL LSH-INDEX MAINTENANCE — the at-rest dedup "
    "index (operators/dedup.banded_signatures: one (doc, band_id, "
    "band_hash) row per band) kept current from a corpus snapshot diff "
    "instead of a rebuild: corpus_diff(A, B) classifies docs, stale "
    "index rows (removed + changed) leave via an anti-join on doc id, "
    "and MinHash signatures are computed ONLY for the delta (added + "
    "changed) — at 100 TB the maintenance cost is O(|delta|) signature "
    "work + an anti-join against the slim 3-column index, never a "
    "corpus re-signature. CONTRACT: the maintained index must equal "
    "the from-scratch rebuild of B exactly — verified Spark-side by an "
    "O(1)-ROW multiset checksum (operators/checksum.py: count + "
    "bit_xor + decimal-sum of xxhash64 over (doc, band_id, band_hash), "
    "each side folding map-side to one row — no corpus-width exchange; "
    "xxhash64 has no ANSI form, so that check is a literal-1 oracle "
    "row), while per-status doc counts and index-row deltas are "
    "SQL-exact: a doc carries 8 band rows iff it has >= 3 tokens "
    "(word 3-gram shingles exist), which the oracle computes from the "
    "same tokenizer convention. At rest the index stays partitioned on "
    "(band_id, band_hash) (the probe key — see st_incremental_dedup); "
    "deletions land as doc-id tombstones folded in on compaction, "
    "expressed here as the anti-join.",
)
def llm_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _llm_index_maintenance_impl(spark, sf_dir)


def _llm_index_maintenance_impl(
    spark: SparkSession, sf_dir: str, timings: dict | None = None
) -> DataFrame:
    """Body of llm_index_maintenance. ``timings``, when a dict, receives
    the stage split: ``maintain_s`` (the OPERATOR — diff, delta
    signatures, anti-join, union; O(|delta|) signature work) vs
    ``verify_s`` (the CONTRACT — a from-scratch corpus re-signature
    folded to a 1-row multiset checksum per side, the cost the operator
    exists to avoid), plus ``plan_setup_s``/``total_s`` so the fields
    sum to the wall."""
    import time as _time

    _impl_t0 = _time.perf_counter()

    from accident_prediction_montreal_spark import cachereg
    from accident_prediction_montreal_spark.operators.dedup import (
        banded_signatures,
    )
    from accident_prediction_montreal_spark.operators.text import corpus_diff

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    b = snapshot_b(docs)
    # diff feeds four consumers (status counts, stale set, fresh set);
    # it is tiny ((id, status) rows) — persist, lifecycle via cachereg.
    diff = corpus_diff(docs, b).persist()
    cachereg.register("plans.llm_index_maintenance", diff)

    bands = ["doc", "band_id", "band_hash"]
    # The fact branches re-reference idx_a/maintained/rebuild; the
    # planned tree shows 93 parquet scans, but persisting them was
    # MEASURED as a non-win at sf0.1 (4.35 -> 4.58 s min-of-3): AQE
    # reuses the identical signature-aggregate exchanges at runtime,
    # and at 100 TB the at-rest index is a parquet table, not a
    # recomputation — so the branches would read cheap pruned parquet,
    # and caching corpus-scale frames would be the real anti-pattern.
    idx_a = banded_signatures(docs).select(*bands)
    if timings is not None:
        # The at-rest index of A pre-exists in production (one-off
        # build); charged separately so maintain_s is the real
        # per-snapshot cost.
        _t0 = _time.perf_counter()
        idx_a = idx_a.persist()
        idx_a.count()
        timings["index_build_s"] = round(_time.perf_counter() - _t0, 3)
        _t0 = _time.perf_counter()
    stale = diff.filter(F.col("status").isin("removed", "changed")).select(
        F.col("doc_id").alias("doc")
    )
    fresh_docs = b.join(
        diff.filter(F.col("status").isin("added", "changed")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    inserted = banded_signatures(fresh_docs).select(*bands)
    kept = idx_a.join(stale, "doc", "left_anti")
    maintained = kept.unionByName(inserted)
    if timings is not None:
        maintained = maintained.persist()
        inserted = inserted.persist()
        maintained.count()
        timings["maintain_s"] = round(_time.perf_counter() - _t0, 3)
        _verify_t0 = _time.perf_counter()
    rebuild = banded_signatures(b).select(*bands)

    # Multiset-checksum equality (operators/checksum.py): each side
    # folds map-side to ONE (cnt, xor, sum-of-xxhash64) row — the
    # contract keeps its full strength (multiset equality over the
    # 3-col index) without the two corpus-width symmetric-anti-join
    # exchanges r11 paid. The rebuild re-signature pass remains the
    # honest price of the contract; the anti-join form survives in
    # pytest (test_wave11.py) as the checksum's own oracle.
    mismatches = checksum_equal_fact(
        maintained, rebuild, bands, "delta_equals_rebuild"
    )
    doc_counts = diff.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).select(F.concat(F.lit("docs_"), F.col("status")).alias("facet"), "n")

    def one(facet: str, frame: DataFrame) -> DataFrame:
        return frame.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
            F.lit(facet).alias("facet"), "n"
        )

    facts = (
        doc_counts.unionByName(one("rows_deleted", idx_a.join(stale, "doc", "left_semi")))
        .unionByName(one("rows_inserted", inserted))
        .unionByName(one("rows_final", maintained))
        .unionByName(mismatches)
    ).orderBy("facet")
    if timings is not None:
        facts = facts.persist()
        facts.count()
        timings["verify_s"] = round(_time.perf_counter() - _verify_t0, 3)
        wall = _time.perf_counter() - _impl_t0
        staged = (
            timings["index_build_s"]
            + timings["maintain_s"]
            + timings["verify_s"]
        )
        timings["plan_setup_s"] = round(max(0.0, wall - staged), 3)
        timings["total_s"] = round(wall, 3)
        maintained.unpersist()
        inserted.unpersist()
        idx_a.unpersist()
    return facts


_REG["llm_index_maintenance"] = _QS(
    fn=_REG["llm_index_maintenance"].fn,
    oracle=_index_maintenance_oracle(),
    description=_REG["llm_index_maintenance"].description,
)


# --- URL canonicalization + variant dedup -------------------------------------


def _url_fixture_sql() -> str:
    """Raw-URL fixture as SQL: 4 decorated variants per base page (the
    same closed-form construction as the Spark side below)."""
    return """
      SELECT doc_id,
        CASE CAST(doc_id % 4 AS INT)
          WHEN 0 THEN 'https://d' || CAST((doc_id // 4) % 50 AS VARCHAR)
            || '.example.com/p/' || CAST(doc_id // 4 AS VARCHAR)
          WHEN 1 THEN 'https://d' || CAST((doc_id // 4) % 50 AS VARCHAR)
            || '.example.com/p/' || CAST(doc_id // 4 AS VARCHAR)
            || '?utm_source=feed&utm_campaign=c' || CAST(doc_id % 9 AS VARCHAR)
          WHEN 2 THEN 'HTTPS://WWW.D' || CAST((doc_id // 4) % 50 AS VARCHAR)
            || '.EXAMPLE.COM/p/' || CAST(doc_id // 4 AS VARCHAR)
          ELSE 'https://d' || CAST((doc_id // 4) % 50 AS VARCHAR)
            || '.example.com:443/p/' || CAST(doc_id // 4 AS VARCHAR)
            || '/#sec' || CAST(doc_id % 5 AS VARCHAR)
        END AS url
      FROM documents
    """


def _url_canonicalize_oracle() -> str:
    from accident_prediction_montreal_spark.functions.url import (
        canonicalize_url_sql,
    )

    canon = canonicalize_url_sql("url")
    return f"""
    WITH raw AS ({_url_fixture_sql()}),
    canon AS (
      SELECT doc_id, {canon} AS curl FROM raw
    ),
    per_url AS (
      SELECT curl,
        regexp_extract(curl, '^https?://([^/]*)', 1) AS domain,
        COUNT(*) AS n_variants, MIN(doc_id) AS canonical_doc_id
      FROM canon GROUP BY curl
    )
    SELECT domain,
      CAST(SUM(n_variants) AS BIGINT) AS n_urls_raw,
      CAST(COUNT(*) AS BIGINT) AS n_urls_canonical,
      CAST(SUM(n_variants) - COUNT(*) AS BIGINT) AS n_dup_variants,
      CAST(SUM(canonical_doc_id) AS BIGINT) AS canonical_id_sum
    FROM per_url GROUP BY domain ORDER BY domain
    """


@register(
    "llm_url_canonicalize",
    oracle=None,  # set below (composed SQL)
    description="URL CANONICALIZATION + VARIANT DEDUP — the first "
    "normalization pass of a web corpus (CCNet-style pipelines dedup "
    "on the canonical URL before any content hashing): lowercase "
    "scheme/host, strip www. and default ports, drop fragments, remove "
    "tracking parameters (utm_*/fbclid/gclid, other params preserved), "
    "strip trailing slashes (functions/url.canonicalize_url — pure "
    "regexp/lower column expressions inside whole-stage codegen, no "
    "UDF), then per-domain rollup: raw vs canonical URL counts, "
    "collapsed-variant count, canonical-representative id checksum. "
    "Fixture: 4 closed-form decorated variants per base page "
    "(plain / +utm / WWW+uppercase / :443+trailing-slash+fragment) "
    "that MUST collapse to one canonical URL each. Plan: one map pass "
    "+ two map-side-combined aggregates (per-URL then per-domain). "
    "Oracle: the identical regex pipeline in DuckDB via the shared "
    "functions/url.canonicalize_url_sql builder, so the two "
    "canonicalizers cannot drift.",
)
def llm_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from accident_prediction_montreal_spark.functions.url import canonicalize_url

    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    # integer `div`, not a double `/` + cast: double math truncates
    # differently for ids past 2^53 and `//` floors — keep the fixture
    # exact at any id width (mirrors the oracle's `//`).
    base = F.expr("doc_id div 4")
    dom_n = (base % 50).cast("string")
    page = base.cast("string")
    v = (F.col("doc_id") % 4).cast("int")
    url = (
        F.when(
            v == 0,
            F.concat(
                F.lit("https://d"), dom_n, F.lit(".example.com/p/"), page
            ),
        )
        .when(
            v == 1,
            F.concat(
                F.lit("https://d"), dom_n, F.lit(".example.com/p/"), page,
                F.lit("?utm_source=feed&utm_campaign=c"),
                (F.col("doc_id") % 9).cast("string"),
            ),
        )
        .when(
            v == 2,
            F.concat(
                F.lit("HTTPS://WWW.D"), dom_n, F.lit(".EXAMPLE.COM/p/"), page
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://d"), dom_n, F.lit(".example.com:443/p/"), page,
                F.lit("/#sec"), (F.col("doc_id") % 5).cast("string"),
            )
        )
    )
    canon = docs.select("doc_id", canonicalize_url(url).alias("curl"))
    per_url = canon.groupBy("curl").agg(
        F.count(F.lit(1)).alias("n_variants"),
        F.min("doc_id").alias("canonical_doc_id"),
    ).withColumn(
        "domain", F.regexp_extract(F.col("curl"), "^https?://([^/]*)", 1)
    )
    return (
        per_url.groupBy("domain")
        .agg(
            F.sum("n_variants").cast("long").alias("n_urls_raw"),
            F.count(F.lit(1)).cast("long").alias("n_urls_canonical"),
            (F.sum("n_variants") - F.count(F.lit(1)))
            .cast("long")
            .alias("n_dup_variants"),
            F.sum("canonical_doc_id").cast("long").alias("canonical_id_sum"),
        )
        .orderBy("domain")
    )


_REG["llm_url_canonicalize"] = _QS(
    fn=_REG["llm_url_canonicalize"].fn,
    oracle=_url_canonicalize_oracle(),
    description=_REG["llm_url_canonicalize"].description,
)


# --- incremental embedding refresh --------------------------------------------


def _embedding_refresh_oracle() -> str:
    return f"""
    WITH b AS ({_SQL_SNAPSHOT_B}),
    d AS (
      SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
        CASE
          WHEN a.doc_id IS NULL THEN 'added'
          WHEN b.doc_id IS NULL THEN 'removed'
          WHEN md5(a.text) IS DISTINCT FROM md5(b.text) THEN 'changed'
          ELSE 'unchanged'
        END AS status
      FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    ),
    facts AS (
      SELECT 'docs_' || status AS facet, CAST(COUNT(*) AS BIGINT) AS n
      FROM d GROUP BY status
      UNION ALL
      SELECT 'emb_recomputed', CAST(COUNT(*) AS BIGINT)
      FROM d WHERE status IN ('added', 'changed')
      UNION ALL
      SELECT 'emb_carried', CAST(COUNT(*) AS BIGINT)
      FROM d WHERE status = 'unchanged'
      UNION ALL
      SELECT 'emb_final', CAST(COUNT(*) AS BIGINT) FROM b
      UNION ALL
      SELECT 'refresh_equals_recompute', CAST(1 AS BIGINT)
    )
    SELECT facet, n FROM facts ORDER BY facet
    """


@register(
    "llm_embedding_refresh",
    oracle=None,  # set below (composed SQL)
    description="INCREMENTAL EMBEDDING REFRESH — the third leg of the "
    "snapshot-delta trilogy (llm_corpus_diff classifies, "
    "llm_index_maintenance patches the dedup index, THIS patches the "
    "embedding table): the ENCODER is the expensive stage of a real "
    "pipeline (GPU inference), so unchanged documents CARRY their "
    "existing vectors via a join against the old embedding table — the "
    "model runs only on added + changed docs, O(|delta|) inference "
    "instead of O(|corpus|). The encoder here is a deterministic "
    "Arrow-batched mapInPandas stub (numpy hash of the text bytes -> "
    "unit 8-dim vector; a real sentence encoder plugs into the same "
    "batch signature — the Spark-side plumbing, schema and batching "
    "are the real thing). CONTRACT: the refreshed table must equal a "
    "full re-encode of snapshot B exactly — verified Spark-side by an "
    "O(1)-row multiset checksum over (doc_id, vector rounded to 1e-12) "
    "(operators/checksum.py — no corpus-width exchange; the stub has "
    "no ANSI form, so that check is a literal-1 oracle row), while "
    "per-status doc counts and "
    "recomputed/carried/final row counts are SQL-exact from the same "
    "md5 diff the trilogy shares. At rest both snapshots and the "
    "embedding table are id-partitioned, so the carry join and the "
    "diff co-locate shuffle-free.",
)
def llm_embedding_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _llm_embedding_refresh_impl(spark, sf_dir)


def _llm_embedding_refresh_impl(
    spark: SparkSession, sf_dir: str, timings: dict | None = None
) -> DataFrame:
    """Body of llm_embedding_refresh. ``timings``, when a dict, gets
    ``encode_base_s`` (embedding table of A — pre-exists in production),
    ``refresh_s`` (the OPERATOR: diff + delta encode + carry join),
    ``verify_s`` (full re-encode + compare — the cost the operator
    avoids), ``plan_setup_s``/``total_s``."""
    import time as _time

    _impl_t0 = _time.perf_counter()

    from accident_prediction_montreal_spark import cachereg
    from accident_prediction_montreal_spark.operators.text import corpus_diff

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    b = snapshot_b(docs)

    # emb_a / refreshed / recompute_full feed several fact branches;
    # persisting them was measured as a non-win at sf0.1 (1.74 ->
    # 2.01 s) — AQE exchange reuse covers the recompute, and the
    # production embedding table is at rest anyway (see the
    # llm_index_maintenance note).
    emb_a = _encode_stub(docs)
    if timings is not None:
        _t0 = _time.perf_counter()
        emb_a = emb_a.persist()
        emb_a.count()
        timings["encode_base_s"] = round(_time.perf_counter() - _t0, 3)
        _t0 = _time.perf_counter()

    diff = corpus_diff(docs, b).persist()
    cachereg.register("plans.llm_embedding_refresh", diff)
    carried = emb_a.join(
        diff.filter(F.col("status") == "unchanged").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    fresh_docs = b.join(
        diff.filter(F.col("status").isin("added", "changed")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    recomputed = _encode_stub(fresh_docs)
    refreshed = carried.unionByName(recomputed)
    if timings is not None:
        refreshed = refreshed.persist()
        recomputed = recomputed.persist()
        refreshed.count()
        timings["refresh_s"] = round(_time.perf_counter() - _t0, 3)
        _verify_t0 = _time.perf_counter()

    recompute_full = _encode_stub(b)

    # Multiset-checksum equality over (doc_id, rounded vector) — one
    # 1-row aggregate per side instead of r11's full-outer element-wise
    # compare (a corpus-width exchange). Vectors hash ROUNDED to 12
    # decimals: our encoder stub is bitwise-deterministic, but the
    # pattern must survive a real encoder whose float reductions can
    # wobble in the last ulp; a genuine divergence dwarfs 1e-12. The
    # full-outer form survives in pytest as the checksum's oracle.
    def _rounded(frame: DataFrame) -> DataFrame:
        return frame.select(
            "doc_id",
            F.transform("embedding", lambda x: F.round(x, 12)).alias("emb_r"),
        )

    mismatches = checksum_equal_fact(
        _rounded(refreshed),
        _rounded(recompute_full),
        ["doc_id", "emb_r"],
        "refresh_equals_recompute",
    )
    doc_counts = diff.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).select(F.concat(F.lit("docs_"), F.col("status")).alias("facet"), "n")

    def one(facet: str, frame: DataFrame) -> DataFrame:
        return frame.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
            F.lit(facet).alias("facet"), "n"
        )

    # Count facts from the cached DIFF, not from encoder passes (r15;
    # guide §1.2 don't compute what you throw away): the encoder is a
    # 1:1 row map, so |emb_recomputed| = |added ∪ changed|,
    # |emb_carried| = |unchanged| and |emb_final| = |b| BY DEFINITION —
    # and the ORACLE defines these three facets exactly this way
    # (counts over the diff statuses / over b, _embedding_refresh_
    # oracle above). The old branches re-ran the mapInPandas encoder
    # (opaque to column pruning, invisible to AQE exchange reuse) once
    # per count just to throw the vectors away — 3 of the plan's ~7
    # encode passes. The encoder itself stays fully exercised where it
    # carries information: the refresh-equals-recompute multiset
    # checksum over the actual vectors.
    facts = (
        doc_counts.unionByName(
            one(
                "emb_recomputed",
                diff.filter(F.col("status").isin("added", "changed")),
            )
        )
        .unionByName(one("emb_carried", diff.filter(F.col("status") == "unchanged")))
        .unionByName(one("emb_final", b))
        .unionByName(mismatches)
    ).orderBy("facet")
    if timings is not None:
        facts = facts.persist()
        facts.count()
        timings["verify_s"] = round(_time.perf_counter() - _verify_t0, 3)
        wall = _time.perf_counter() - _impl_t0
        staged = (
            timings["encode_base_s"]
            + timings["refresh_s"]
            + timings["verify_s"]
        )
        timings["plan_setup_s"] = round(max(0.0, wall - staged), 3)
        timings["total_s"] = round(wall, 3)
        refreshed.unpersist()
        recomputed.unpersist()
        emb_a.unpersist()
    return facts


def _encode_stub(docs: DataFrame, dim: int = 8) -> DataFrame:
    """Deterministic encoder STUB with a real model-serving shape:
    Arrow-batched mapInPandas over (doc_id, text) -> (doc_id,
    embedding array<double>) — the batch signature a sentence encoder
    (or a Triton/vLLM client) plugs into. Vector = md5(text) bytes
    folded into ``dim`` doubles in [0,1), L2-normalized; NULL text
    encodes as the zero vector (a real pipeline would filter first).
    Deterministic across runs/layouts so refresh-vs-recompute equality
    is byte-exact."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )

    def encode(batches):
        for pdf in batches:
            vecs = []
            for t in pdf["text"]:
                if t is None:
                    vecs.append([0.0] * dim)
                    continue
                h = hashlib.md5(t.encode("utf-8")).digest()
                raw = np.frombuffer(h, dtype=np.uint16).astype(np.float64)
                v = (raw[:dim] % 4096) / 4096.0
                n = float(np.sqrt((v * v).sum()))
                vecs.append(list(v / n) if n > 0 else [0.0] * dim)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": vecs})

    return docs.mapInPandas(encode, schema=out_schema)


_REG["llm_embedding_refresh"] = _QS(
    fn=_REG["llm_embedding_refresh"].fn,
    oracle=_embedding_refresh_oracle(),
    description=_REG["llm_embedding_refresh"].description,
)


# --- streaming digest change filter (CDC twin of the trilogy) -----------------


def _fold_digest_revisions(st_rev, st_dig, ids, revs, texts):
    """Pure fold of one state shard's batch slice — extracted so the
    stream's two contracts are directly property-testable
    (test_properties.py): (a) emissions are identical under ANY split
    of rev-ordered delivery into batches; (b) the final state is
    identical under ANY arrival order (a stale rev <= seen is dropped,
    never re-emitted). Mutates st_rev/st_dig in place (the caller owns
    the state round-trip); returns (out_ids, out_revs, out_statuses).
    """
    import hashlib

    order = sorted(range(len(ids)), key=lambda k: (revs[k], ids[k]))
    out_id, out_rev, out_status = [], [], []
    for k in order:
        i, rev, t = ids[k], int(revs[k]), texts[k]
        last = st_rev.get(i)
        if last is not None and last >= rev:
            continue  # stale replay: drop
        dg = None if t is None else hashlib.md5(t.encode("utf-8")).hexdigest()
        if last is None:
            status = "added"
        elif st_dig[i] != dg:  # None-safe: both-None == unchanged
            status = "changed"
        else:
            status = "unchanged"
        out_id.append(i)
        out_rev.append(rev)
        out_status.append(status)
        st_rev[i] = rev
        st_dig[i] = dg
    return out_id, out_rev, out_status


def _corpus_diff_stream_oracle() -> str:
    return f"""
    WITH b AS ({_SQL_SNAPSHOT_B}),
    rev1 AS (
      SELECT CAST(1 AS BIGINT) AS rev, 'added' AS status,
        CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
      FROM documents
    ),
    d AS (
      SELECT b.doc_id,
        CASE
          WHEN a.doc_id IS NULL THEN 'added'
          WHEN md5(a.text) IS DISTINCT FROM md5(b.text) THEN 'changed'
          ELSE 'unchanged'
        END AS status
      FROM b LEFT JOIN documents a ON a.doc_id = b.doc_id
    ),
    rev2 AS (
      SELECT CAST(2 AS BIGINT) AS rev, status,
        CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
      FROM d GROUP BY status
    )
    SELECT * FROM rev1 UNION ALL SELECT * FROM rev2
    ORDER BY rev, status
    """


@register(
    "st_corpus_diff_stream",
    oracle=None,  # set below (composed SQL)
    description="STREAMING DIGEST CHANGE FILTER — the CDC twin of the "
    "snapshot-delta trilogy: document upserts stream in (two snapshot "
    "replays as mtime-pinned micro-batches, the 'periodic full-crawl "
    "re-send' shape), and a stateful filter keeps ONE (rev, 16-byte "
    "md5) per doc_id — suppressing no-op upserts so only genuinely "
    "added/changed docs flow to the expensive downstream stages "
    "(re-embed, re-index, re-screen). Statuses are REV-order driven "
    "(rows fold per key sorted by rev, state advances monotonically; "
    "stale rev <= seen is dropped), so the emitted classification is "
    "identical under ANY split of rev-ordered delivery into "
    "micro-batches, and the FINAL STATE (max rev + its digest per doc) "
    "is identical under ANY arrival order — an out-of-order replay "
    "degrades gracefully: its stale revisions are dropped, not "
    "re-emitted (both properties hypothesis-tested, "
    "test_properties.py). The mtime-pinned fixture delivers revs in "
    "order, which is what makes a full VALUE oracle possible for a "
    "stateful stream: md5 is byte-identical across engines, so the per-rev "
    "status counts + id sums equal the batch diff SQL exactly (only "
    "'removed' is absent — upsert streams cannot see deletions without "
    "tombstones; the batch diff llm_corpus_diff covers those). State "
    "cost is the honest CDC price: O(|corpus|) keys x ~24 bytes, "
    "RocksDB-backed at 100 TB; the saving is the downstream encoder "
    "never re-running on unchanged docs (llm_embedding_refresh's "
    "measured 4x).",
)
def st_corpus_diff_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from accident_prediction_montreal_spark.plans.llm_ops import _run_to_memory_sink
    from accident_prediction_montreal_spark.plans.relational_extra import _scratch

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    b = snapshot_b(docs)
    base, _ = _scratch("stdiff", sf_dir)
    p1 = os.path.join(base, "rev1.parquet")
    p2 = os.path.join(base, "rev2.parquet")
    docs.withColumn("rev", F.lit(1).cast("long")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(p1)
    b.withColumn("rev", F.lit(2).cast("long")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(p2)
    # mtime-pinned ascending (the _two_batch_fixture convention):
    # maxFilesPerTrigger=1 then replays rev1 before rev2. The fold below
    # is rev-ordered anyway, so even a merged/reordered delivery yields
    # the same statuses.
    for i, p in enumerate((p1, p2)):
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (1_000_000_000 + i, 1_000_000_000 + i))

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("rev", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        # glob: the two revisions live in sibling rev*.parquet dirs
        .parquet(os.path.join(base, "rev*.parquet"))
    )
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("rev", T.LongType()),
            T.StructField("status", T.StringType()),
        ]
    )

    # SHARDED state (the sharded_heavy_hitters pattern,
    # streaming/stateful.py): one state GROUP per doc_id means one
    # Python call + state round-trip per document per batch — measured
    # 25 s at sf1 (114k groups). Hash shards cut that to NB groups,
    # each folding its slice vectorized; a doc's whole stream lands in
    # ONE shard, so the per-doc rev logic is unchanged. State per shard
    # is three parallel arrays (~|corpus|/NB entries, 24 B/doc).
    NB = 64

    def classify(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids0, revs0, digs0 = state.get
            st_rev = dict(zip(ids0, revs0))
            st_dig = dict(zip(ids0, digs0))
        else:
            st_rev, st_dig = {}, {}
        pdf = pd.concat(list(pdfs))
        out_id, out_rev, out_status = _fold_digest_revisions(
            st_rev, st_dig, pdf["doc_id"].tolist(), pdf["rev"].tolist(),
            pdf["text"].tolist(),
        )
        keys = list(st_rev.keys())
        state.update(
            (keys, [st_rev[k] for k in keys], [st_dig[k] for k in keys])
        )
        if out_id:
            yield pd.DataFrame(
                {"doc_id": out_id, "rev": out_rev, "status": out_status}
            )

    classified = (
        stream.withColumn(
            "shard", (F.col("doc_id") % NB).cast("int")
        )
        .groupBy("shard")
        .applyInPandasWithState(
            classify,
            outputStructType=out_schema,
            stateStructType=(
                "ids ARRAY<LONG>, revs ARRAY<LONG>, digs ARRAY<STRING>"
            ),
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    got = _run_to_memory_sink(spark, classified, "append")
    return (
        got.groupBy("rev", "status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        .orderBy("rev", "status")
    )


_REG["st_corpus_diff_stream"] = _QS(
    fn=_REG["st_corpus_diff_stream"].fn,
    oracle=_corpus_diff_stream_oracle(),
    description=_REG["st_corpus_diff_stream"].description,
)


# --- blocklist domain filtering ------------------------------------------------


def _blocklist_oracle() -> str:
    return """
    WITH hosts AS (
      SELECT doc_id,
        CASE CAST(doc_id % 3 AS INT)
          WHEN 0 THEN 'd' || CAST(doc_id % 20 AS VARCHAR) || '.example.com'
          WHEN 1 THEN 'cdn.d' || CAST(doc_id % 20 AS VARCHAR) || '.example.com'
          ELSE 'd' || CAST(doc_id % 20 AS VARCHAR) || '.example.org'
        END AS host
      FROM documents
    ),
    blocklist AS (
      SELECT * FROM (VALUES ('d3.example.com'), ('d7.example.com'),
                            ('cdn.d11.example.com'), ('example.org')) b(rule)
    ),
    sufs AS (
      SELECT doc_id, host, unnest(list_transform(
        range(1, len(string_split(host, '.'))),
        i -> array_to_string(string_split(host, '.')[i:], '.'))) AS suf
      FROM hosts
    ),
    blocked AS (
      SELECT DISTINCT doc_id FROM sufs JOIN blocklist ON suf = rule
    ),
    labeled AS (
      SELECT h.doc_id, h.host,
        CASE WHEN b.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_blocked
      FROM hosts h LEFT JOIN blocked b ON h.doc_id = b.doc_id
    )
    SELECT host,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(is_blocked) AS BIGINT) AS n_blocked,
      CAST(SUM(CASE WHEN is_blocked = 0 THEN doc_id ELSE 0 END) AS BIGINT)
        AS kept_id_sum
    FROM labeled GROUP BY host ORDER BY host
    """


@register(
    "llm_blocklist_filter",
    oracle=None,  # set below (composed SQL)
    description="BLOCKLIST DOMAIN FILTERING with SUFFIX-match semantics "
    "— the C4/CCNet gating step that drops documents from banned "
    "domains, where a rule like 'example.org' must block EVERY "
    "subdomain under it: each host expands to its dot-suffix chain "
    "(full host down to the 2-label apex, <= ~5 rows per host — a "
    "bounded explode), the expansion equi-joins the blocklist "
    "(broadcast: real blocklists are 1e4-1e6 rules, kilobytes-to-MBs "
    "beside a 100 TB corpus — the classic small-dim broadcast), and "
    "blocked ids drop via the distinct-semi/anti pattern so a host "
    "matching several rules still blocks once. Suffix labels build "
    "with transform/slice/array_join column HOFs — interpreted, but "
    "over <=5-element arrays in a pure map stage (no HOF-in-join-key "
    "hot path). Fixture: hosts are a closed-form mix of apex, "
    "subdomain and .org variants; rules hit an apex (blocks its cdn. "
    "subdomain too), an exact subdomain (blocks ONLY that host), and "
    "a registrable-domain suffix (blocks every .example.org host). "
    "Oracle: the identical suffix expansion in DuckDB "
    "(list_transform/range/list-slice).",
)
def llm_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    k = (F.col("doc_id") % 20).cast("string")
    v = (F.col("doc_id") % 3).cast("int")
    host = (
        F.when(v == 0, F.concat(F.lit("d"), k, F.lit(".example.com")))
        .when(v == 1, F.concat(F.lit("cdn.d"), k, F.lit(".example.com")))
        .otherwise(F.concat(F.lit("d"), k, F.lit(".example.org")))
    )
    hosts = docs.select("doc_id", host.alias("host"))
    rules = hosts.sparkSession.createDataFrame(
        [("d3.example.com",), ("d7.example.com",),
         ("cdn.d11.example.com",), ("example.org",)],
        ["rule"],
    )
    labels = F.split(F.col("host"), "\\.")
    n = F.size(labels)
    suffixes = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.array_join(F.slice(labels, i, n - i + 1), "."),
    )
    sufs = hosts.select("doc_id", F.explode(suffixes).alias("suf"))
    blocked = (
        sufs.join(F.broadcast(rules), sufs["suf"] == rules["rule"], "left_semi")
        .select("doc_id")
        .distinct()
    )
    labeled = hosts.join(
        blocked.withColumn("is_blocked", F.lit(1)), "doc_id", "left"
    ).withColumn("is_blocked", F.coalesce("is_blocked", F.lit(0)))
    return (
        labeled.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("is_blocked").cast("long").alias("n_blocked"),
            F.sum(
                F.when(F.col("is_blocked") == 0, F.col("doc_id")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("kept_id_sum"),
        )
        .orderBy("host")
    )


_REG["llm_blocklist_filter"] = _QS(
    fn=_REG["llm_blocklist_filter"].fn,
    oracle=_blocklist_oracle(),
    description=_REG["llm_blocklist_filter"].description,
)


# --- massive-query-side ANN (bucketed IVF top-k) -------------------------------


@register(
    "sim_cosine_topk_bucketed",
    oracle="""
    WITH e AS (
      -- degenerate-vector contract (r14): NULL/zero-norm drop — cosine
      -- is undefined for them
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE embedding IS NOT NULL
        AND list_dot_product(CAST(embedding AS DOUBLE[]),
                             CAST(embedding AS DOUBLE[])) > 0
    ),
    n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nv FROM e
    ),
    q AS (
      SELECT vec_id AS query_id, v AS qv, nv AS nq FROM n
      WHERE vec_id % 20 = 7
    ),
    pairs AS (
      SELECT q.query_id, n.vec_id,
        list_dot_product(q.qv, n.v) / (q.nq * n.nv) AS cosine
      FROM n CROSS JOIN q
    )
    SELECT query_id, vec_id, ROUND(cosine, 6) + 0.0 AS cosine,
      CAST(rn AS BIGINT) AS "rank"
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id ASC) AS rn
      FROM pairs
    ) WHERE rn <= 3 ORDER BY query_id, rn
    """,
    description="MASSIVE-QUERY-SIDE ANN — ivf_cosine_topk_bucketed "
    "(operators/ivf.py), the implemented form of the regime split the "
    "serving-shape ivf_cosine_topk documents: 5% of the corpus queries "
    "the whole corpus (the batch-inference shape: re-rank, dedup "
    "candidates, link prediction), which would make the window form's "
    "|queries| x n_cells probe shuffle and interpreted expression "
    "cosine the bottleneck. The bucketed plan is the decontamination "
    "pattern: zero-shuffle probe selection against driver-local "
    "centroids, cogroup-per-cell numpy Gram matmul emitting CELL-LOCAL "
    "top-k (the shuffle after the matmul carries <= n_probe x k rows "
    "per query, never the candidate set), then a bounded global "
    "re-rank. Run in EXACT mode (n_probe = n_cells = 8, the self-hit-"
    "independent setting) so the brute-force SQL scan is a full value "
    "oracle; equality with both ivf_cosine_topk and the brute scan is "
    "also pinned by test_tuning_skew_ivf. The quantizer fit is the "
    "usual capped-iteration fixed cost (PERF.md r10).",
)
def sim_cosine_topk_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from accident_prediction_montreal_spark.operators.ivf import (
        build_ivf_index,
        ivf_cosine_topk_bucketed,
    )

    from accident_prediction_montreal_spark.functions.vectors import valid_vectors

    # cosine metric: degenerate vectors drop (r14 contract; oracle WHERE)
    emb = valid_vectors(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") % 20 == 7).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    assigned, cents = build_ivf_index(
        emb, n_cells=8, sample_fraction=0.25, max_iter=5
    )
    out = ivf_cosine_topk_bucketed(
        queries, assigned, cents, k=3, n_probe=8
    )
    return out.select(
        "query_id",
        "vec_id",
        (F.round("cosine", 6) + 0.0).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    ).orderBy("query_id", "rank")
