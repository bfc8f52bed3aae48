"""Wave-12 queries (r12): PSL-aware blocklist gating.

Round-12 is a consolidation round (checksum verify stages, skew-lever
gating, window rotation); the one new surface item is the r11 verdict's
stretch ask — blocklist apex semantics via a public-suffix snapshot,
the distinction a real C4/CCNet domain gate draws between REGISTRABLE
domains (can block their whole subtree) and PUBLIC suffixes (cannot
block anything: everything under .org belongs to different owners).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.functions.url import (
    PSL_SNAPSHOT,
    registrable_domain,
    registrable_domain_sql,
)
from accident_prediction_montreal_spark.plans.registry import register
from accident_prediction_montreal_spark.sources.registry import load_table

#: fixture rules: apex / exact-subdomain / registrable-suffix rules that
#: MUST block, and public-suffix rules that MUST be inert.
_PSL_RULES = [
    "d3.example.com",        # apex: blocks its cdn. subtree too
    "cdn.d11.example.com",   # deeper than registrable: that host only
    "example.org",           # registrable: blocks every d*.example.org
    "org",                   # PUBLIC SUFFIX -> inert (the PSL point)
    "github.io",             # PSL private-section entry -> inert
    "u7.github.io",          # registrable one label below github.io
    "co.uk",                 # two-label public suffix -> inert
    "example.co.uk",         # registrable under co.uk: blocks subtree
]


def _psl_hosts_sql() -> str:
    return """
      SELECT doc_id,
        CASE CAST(doc_id % 5 AS INT)
          WHEN 0 THEN 'd' || CAST(doc_id % 20 AS VARCHAR) || '.example.com'
          WHEN 1 THEN 'cdn.d' || CAST(doc_id % 20 AS VARCHAR) || '.example.com'
          WHEN 2 THEN 'd' || CAST(doc_id % 20 AS VARCHAR) || '.example.org'
          WHEN 3 THEN 'u' || CAST(doc_id % 20 AS VARCHAR) || '.github.io'
          ELSE 'd' || CAST(doc_id % 20 AS VARCHAR) || '.example.co.uk'
        END AS host
      FROM documents
    """


def _blocklist_psl_oracle() -> str:
    rules = ", ".join(f"('{r}')" for r in _PSL_RULES)
    reg = registrable_domain_sql("host")
    return f"""
    WITH hosts AS ({_psl_hosts_sql()}),
    reghosts AS (
      SELECT doc_id, host, {reg} AS reg FROM hosts
    ),
    sufs AS (
      SELECT doc_id, unnest(list_transform(
        range(len(string_split(reg, '.')), len(string_split(host, '.')) + 1),
        L -> array_to_string(
          string_split(host, '.')[len(string_split(host, '.')) - L + 1:],
          '.'))) AS suf
      FROM reghosts WHERE reg IS NOT NULL
    ),
    blocklist AS (SELECT * FROM (VALUES {rules}) b(rule)),
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
    "llm_blocklist_filter_psl",
    oracle=None,  # set below (composed SQL)
    description="PSL-AWARE BLOCKLIST FILTERING — llm_blocklist_filter's "
    "suffix semantics refined to what a real C4/CCNet gate enforces: a "
    "rule blocks a host only if the rule is AT OR BELOW the host's "
    "REGISTRABLE domain (functions/url.registrable_domain — eTLD+1 "
    "against an offline public-suffix snapshot), so 'example.org' "
    "blocks its whole subtree while bare 'org', 'co.uk' or the PSL "
    "private entry 'github.io' block NOTHING (each label under them "
    "belongs to a different owner). Plan: the PSL rides into the plan "
    "as ONE literal array<string> (single serialized Literal at any "
    "snapshot size — no join, no UDF; the longest-match scan is "
    "transform/filter/array_max HOFs over <= ~6 suffixes inside "
    "whole-stage codegen), the host's suffix chain is TRUNCATED at the "
    "registrable domain (public-suffix rules are inert by "
    "construction, not by rule-table curation), and the bounded "
    "explode (<= ~4 rows/host) equi-joins the broadcast rule table "
    "with the distinct-semi pattern, exactly the scale shape of the "
    "non-PSL variant. Oracle: the identical PSL longest-match + "
    "truncated chain in DuckDB via the paired "
    "functions/url.registrable_domain_sql builder.",
)
def llm_blocklist_filter_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    k = (F.col("doc_id") % 20).cast("string")
    v = (F.col("doc_id") % 5).cast("int")
    host = (
        F.when(v == 0, F.concat(F.lit("d"), k, F.lit(".example.com")))
        .when(v == 1, F.concat(F.lit("cdn.d"), k, F.lit(".example.com")))
        .when(v == 2, F.concat(F.lit("d"), k, F.lit(".example.org")))
        .when(v == 3, F.concat(F.lit("u"), k, F.lit(".github.io")))
        .otherwise(F.concat(F.lit("d"), k, F.lit(".example.co.uk")))
    )
    hosts = docs.select("doc_id", host.alias("host"))
    rules = spark.createDataFrame([(r,) for r in _PSL_RULES], ["rule"])

    reghosts = hosts.withColumn(
        "reg", registrable_domain("host", PSL_SNAPSHOT)
    )
    labels = F.split(F.col("host"), "\\.")
    n = F.size(labels)
    reg_len = F.size(F.split(F.col("reg"), "\\."))
    chain = F.when(
        F.col("reg").isNotNull(),
        F.transform(
            F.sequence(reg_len, n),
            lambda length: F.array_join(
                F.slice(labels, n - length + 1, length), "."
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sufs = reghosts.select("doc_id", F.explode(chain).alias("suf"))
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


from accident_prediction_montreal_spark.plans.registry import (  # noqa: E402
    REGISTRY as _REG,
)
from accident_prediction_montreal_spark.plans.registry import (  # noqa: E402
    QuerySpec as _QS,
)

_REG["llm_blocklist_filter_psl"] = _QS(
    fn=_REG["llm_blocklist_filter_psl"].fn,
    oracle=_blocklist_psl_oracle(),
    description=_REG["llm_blocklist_filter_psl"].description,
)


@register(
    "sim_ann_bucketed_recall",
    oracle="""
    SELECT 'bucketed_recall_at_10_ge_0.8' AS chk, CAST(1 AS BIGINT) AS ok
    UNION ALL SELECT 'bucketed_equals_window_form', CAST(1 AS BIGINT)
    """,
    description="MEASURED recall@10 for the APPROXIMATE regime of the "
    "massive-query-side bucketed IVF (sim_cosine_topk_bucketed runs "
    "exact mode so a brute scan can value-oracle it; THIS pins the "
    "n_probe < n_cells regime): the same fixed-seed protocol as "
    "sim_ann_recall (50 queries, L2-normalized vectors, n_probe=5 of "
    "8 cells, recall floor 0.8 against the exact cosine top-10), run "
    "through ivf_cosine_topk_bucketed's cogroup-Gram plan instead of "
    "the serving-shape window plan — plus a second contract row "
    "pinning that at the SAME n_probe the two physical plans return "
    "the IDENTICAL id set (the regime split changes the plan, never "
    "the answer). The recall/latency curve at sf1 is published in "
    "BENCH_ann_bucketed_recall (n_probe in {1,2,4,8}).",
)
def sim_ann_bucketed_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from accident_prediction_montreal_spark.functions.vectors import l2_norm
    from accident_prediction_montreal_spark.operators.ivf import (
        build_ivf_index,
        ivf_cosine_topk,
        ivf_cosine_topk_bucketed,
    )
    from accident_prediction_montreal_spark.operators.similarity import (
        cosine_topk,
    )
    from accident_prediction_montreal_spark.plans.registry import chk_row as _chk

    k, floor, n_probe = 10, 0.8, 5
    emb = (
        load_table(spark, "embeddings", sf_dir)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("_v"))
        .withColumn("_n", l2_norm("_v"))
        .select(
            "vec_id",
            F.transform("_v", lambda x: x / F.col("_n")).alias("embedding"),
        )
    )
    queries = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = cosine_topk(queries, emb, k=k)
    assigned, cents = build_ivf_index(emb, n_cells=8)
    bucketed = ivf_cosine_topk_bucketed(
        queries, assigned, cents, k=k, n_probe=n_probe
    )
    window_form = ivf_cosine_topk(
        queries, assigned, cents, k=k, n_probe=n_probe
    )

    matched = bucketed.select("query_id", "vec_id").join(
        exact.select("query_id", "vec_id", F.lit(1).alias("in_exact")),
        ["query_id", "vec_id"],
        "left",
    )
    n_q = queries.select(F.count(F.lit(1)).alias("n_q"))
    recall_ok = (
        matched.agg(F.sum(F.coalesce("in_exact", F.lit(0))).alias("n_match"))
        .crossJoin(F.broadcast(n_q))
        .select(
            *_chk(
                f"bucketed_recall_at_{k}_ge_{floor}",
                F.col("n_match") / (F.col("n_q") * k) >= floor,
            )
        )
    )
    sym_diff = (
        bucketed.select("query_id", "vec_id")
        .exceptAll(window_form.select("query_id", "vec_id"))
        .unionByName(
            window_form.select("query_id", "vec_id").exceptAll(
                bucketed.select("query_id", "vec_id")
            )
        )
    )
    plans_agree = sym_diff.agg(F.count(F.lit(1)).alias("n")).select(
        *_chk("bucketed_equals_window_form", F.col("n") == 0)
    )
    return recall_ok.unionByName(plans_agree).orderBy("chk")
