"""Wave-5 queries (r7): exact-similarity joins with proofs instead of
heuristics, retrieval ranking, drift monitoring, robust statistics,
association mining, sequence matching and bounded-round graph labeling
— the remaining analytics a training-data/feature platform runs that
the registry did not yet cover. Every query is ANSI-expressible and
value-oracle-backed; every plan is shuffle-bounded by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from accident_prediction_montreal_spark import cachereg
from accident_prediction_montreal_spark.operators.dedup import ppjoin_pairs
from accident_prediction_montreal_spark.operators.text import tokenize
from accident_prediction_montreal_spark.plans.registry import register
from accident_prediction_montreal_spark.sources.registry import load_table

_PP_SHIFT = 100_000
_PP_T = 0.6

# Tokenizer CTE shared by the text-shaped oracles (identical to
# operators/text.py::tokenize: trim → lower → split on whitespace).
_TOKS = """
    toks0 AS (
      SELECT doc_id, CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
             ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS w
      FROM documents
    )
"""


@register(
    "dedup_ppjoin",
    oracle=f"""
    WITH {_TOKS},
    corpus AS (
      SELECT doc_id, w FROM toks0
      UNION ALL
      SELECT doc_id + {_PP_SHIFT},
             w[1:CAST(floor((len(w) * 4 + 4) / 5.0) AS INT)]
      FROM toks0 WHERE doc_id % 20 = 0
    ),
    sh AS (
      SELECT doc_id,
        UNNEST(list_distinct(list_transform(range(1, len(w) - 1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
      FROM corpus WHERE len(w) >= 3
    ),
    sized AS (
      SELECT doc_id, s, COUNT(*) OVER (PARTITION BY doc_id) AS n_sh FROM sh
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        COUNT(*) / CAST(ANY_VALUE(a.n_sh) + ANY_VALUE(b.n_sh) - COUNT(*) AS DOUBLE)
          AS jaccard
      FROM sized a JOIN sized b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING COUNT(*) / CAST(ANY_VALUE(a.n_sh) + ANY_VALUE(b.n_sh) - COUNT(*) AS DOUBLE)
             >= {_PP_T}
    )
    SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard FROM pairs
    ORDER BY id_a, id_b
    """,
    description="EXACT Jaccard threshold self-join via PREFIX FILTERING "
    "(PPJoin, operators/dedup.py::ppjoin_pairs) — the no-heuristic scale "
    "path beside the max_doc_freq-capped inverted index: tokens ordered "
    "by global (doc-freq, hash), only each doc's first "
    "|x|-ceil(t|x|)+1 tokens are indexed (theorem: J>=t forces a shared "
    "prefix token), the PPJoin length filter t*max<=min prunes pairs "
    "before emission, and survivors are verified exactly against the "
    "full shingle-hash arrays. Planted 80%%-prefix copies of every 20th "
    "doc (token-slice planting replayed verbatim in SQL) guarantee "
    "non-trivial matches; the oracle computes ALL exact-Jaccard pairs "
    "with an uncapped shared-shingle join, so a prefix filter that "
    "dropped any qualifying pair hash-mismatches.",
)
def dedup_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    toks = tokenize(F.col("text"))
    keep = F.floor((F.size(toks) * 4 + 4) / F.lit(5.0)).cast("int")
    planted = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + _PP_SHIFT).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 1, keep)).alias("text"),
    )
    corpus = docs.unionByName(planted)
    out = ppjoin_pairs(corpus, "doc_id", "text", n=3, min_jaccard=_PP_T)
    return out.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


@register(
    "a27_market_basket",
    oracle="""
    WITH li AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM li),
    totals AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS cnt FROM li GROUP BY pk),
    pairs AS (
      SELECT a.pk AS pk_a, b.pk AS pk_b, CAST(COUNT(*) AS BIGINT) AS pair_cnt
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY a.pk, b.pk
      HAVING COUNT(*) >= 3
    )
    SELECT pk_a, pk_b, pair_cnt,
      ROUND(pair_cnt / CAST(ta.cnt AS DOUBLE), 6) AS confidence,
      ROUND(pair_cnt * n.n_orders / CAST(ta.cnt * tb.cnt AS DOUBLE), 6) AS lift
    FROM pairs
    JOIN totals ta ON ta.pk = pairs.pk_a
    JOIN totals tb ON tb.pk = pairs.pk_b
    CROSS JOIN n
    ORDER BY lift DESC, pk_a, pk_b
    LIMIT 20
    """,
    description="Market-basket pair mining (A-surface): support, "
    "confidence and lift for part pairs co-purchased within an order. "
    "The pair self-join is keyed on l_orderkey — both sides share one "
    "hash partitioning, and fan-out per order is bounded by the TPC-H "
    "line-count cap (C(7,2) pairs max), so the pair stage is O(orders) "
    "at ANY scale, never O(parts^2); part totals and the order count "
    "are broadcast back onto the (already small) support-filtered pair "
    "set. Top-20 by lift with full tie-breaks.",
)
def a27_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, "lineitem", sf_dir)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a = li.select(F.col("ok"), F.col("pk").alias("pk_a"))
    b = li.select(F.col("ok"), F.col("pk").alias("pk_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("pk_a") < F.col("pk_b"))
        .groupBy("pk_a", "pk_b")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= 3)
    )
    totals = li.groupBy("pk").agg(F.count(F.lit(1)).alias("cnt"))
    n1 = li.agg(F.countDistinct("ok").alias("n_orders"))
    ta = totals.select(F.col("pk").alias("pk_a"), F.col("cnt").alias("cnt_a"))
    tb = totals.select(F.col("pk").alias("pk_b"), F.col("cnt").alias("cnt_b"))
    return (
        pairs.join(F.broadcast(ta), "pk_a")
        .join(F.broadcast(tb), "pk_b")
        .crossJoin(F.broadcast(n1))
        .select(
            "pk_a",
            "pk_b",
            F.col("pair_cnt").cast("long").alias("pair_cnt"),
            F.round(F.col("pair_cnt") / F.col("cnt_a").cast("double"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("pair_cnt")
                * F.col("n_orders")
                / (F.col("cnt_a") * F.col("cnt_b")).cast("double"),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "pk_a", "pk_b")
        .limit(20)
    )


_BM25_TERMS = ["spark", "join", "window"]
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_oracle() -> str:
    tf_cols = ", ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf_{t}" for t in _BM25_TERMS
    )
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{t}"
        for t in _BM25_TERMS
    )
    score = " + ".join(
        f"ln(1 + (n_docs - df_{t} + 0.5) / (df_{t} + 0.5)) * tf_{t} * {_BM25_K1 + 1}"
        f" / (tf_{t} + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))"
        for t in _BM25_TERMS
    )
    return f"""
    WITH base AS (
      SELECT doc_id,
        CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
             ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS w
      FROM documents
    ),
    tf AS (
      SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, {tf_cols} FROM base
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl, {df_cols}
      FROM tf
    )
    SELECT doc_id, ROUND({score}, 6) AS bm25
    FROM tf CROSS JOIN stats
    WHERE {" + ".join(f"tf_{t}" for t in _BM25_TERMS)} > 0
    ORDER BY ROUND({score}, 6) DESC, doc_id
    LIMIT 10
    """


@register(
    "text_bm25",
    oracle=_bm25_oracle(),
    description="BM25 retrieval ranking (text family, beside TF-IDF): "
    "top-10 documents for a fixed 3-term query, k1=1.2 b=0.75. Per-doc "
    "term frequencies are higher-order array filters (JVM-side, zero "
    "shuffle); corpus statistics (N, avgdl, per-term df) come from ONE "
    "1-row aggregate broadcast back with crossJoin — at 100 TB the "
    "scoring pass stays a pure map stage over the corpus with a "
    "scalar-broadcast join, and the only sort is the bounded top-k. "
    "Oracle replays tf/df/avgdl/idf in SQL; rounded scores order the "
    "cut with doc_id tie-break.",
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from accident_prediction_montreal_spark.operators.dedup import _bind_once

    docs = load_table(spark, "documents", sf_dir)
    toks = tokenize(F.col("text"))

    def term_eq(term: str):
        # closure per term — NOT `lambda x, t=t`: a two-parameter lambda
        # makes pyspark pass the ELEMENT INDEX as the second argument,
        # silently rebinding t (see dedup.minhash_signature)
        return lambda x: x == F.lit(term)

    # dl + per-term tfs as ONE struct behind inline(): four separate
    # projection columns each re-evaluate tokenize (Catalyst does no CSE
    # across expressions, and project-collapse re-inlines aliases), a
    # measured 4x on the map stage at sf1. Generate is a collapse
    # barrier, so the struct — and the tokenizer — run exactly once;
    # _bind_once keeps the token array bound once INSIDE the struct.
    def packed(ts):
        return F.struct(
            F.size(ts).cast("double").alias("dl"),
            *[
                F.size(F.filter(ts, term_eq(t))).alias(f"tf_{t}")
                for t in _BM25_TERMS
            ],
        )

    # tf feeds BOTH the corpus-stats aggregate and the scoring pass;
    # persisted (cachereg) so the tokenizer map stage runs once total —
    # at 100 TB this is the "materialize the term-frequency table"
    # step every two-phase ranking pipeline has.
    tf = docs.select("doc_id", F.inline(F.array(_bind_once(toks, packed)))).persist()
    cachereg.register("plans.wave5.bm25", tf)
    stats = tf.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("int")).cast("double").alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    score = None
    for t in _BM25_TERMS:
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{t}") + 0.5) / (F.col(f"df_{t}") + 0.5)
        )
        part = (
            idf
            * F.col(f"tf_{t}")
            * (_BM25_K1 + 1)
            / (
                F.col(f"tf_{t}")
                + _BM25_K1
                * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
            )
        )
        score = part if score is None else score + part
    any_tf = None
    for t in _BM25_TERMS:
        c = F.col(f"tf_{t}")
        any_tf = c if any_tf is None else any_tf + c
    return (
        tf.crossJoin(F.broadcast(stats))
        .filter(any_tf > 0)
        .select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )


_PSI_CUTOFF = "2024-01-16"


@register(
    "m15_psi_drift",
    oracle=f"""
    WITH binned AS (
      SELECT LEAST(CAST(floor(value / 50.0) AS INT), 9) AS bin,
        CASE WHEN ts < TIMESTAMP '{_PSI_CUTOFF} 00:00:00' THEN 1 ELSE 0 END AS is_ref
      FROM events
    ),
    cnts AS (
      SELECT bin,
        CAST(SUM(is_ref) AS BIGINT) AS ref_cnt,
        CAST(SUM(1 - is_ref) AS BIGINT) AS cur_cnt
      FROM binned GROUP BY bin
    ),
    p AS (
      SELECT bin, ref_cnt, cur_cnt,
        ref_cnt / CAST(SUM(ref_cnt) OVER () AS DOUBLE) AS p_ref,
        cur_cnt / CAST(SUM(cur_cnt) OVER () AS DOUBLE) AS p_cur
      FROM cnts
    )
    SELECT bin, ref_cnt, cur_cnt,
      ROUND(p_ref, 6) AS p_ref, ROUND(p_cur, 6) AS p_cur,
      ROUND((p_cur - p_ref) * ln(GREATEST(p_cur, 1e-6) / GREATEST(p_ref, 1e-6)), 6)
        AS psi_term
    FROM p ORDER BY bin
    """,
    description="Population Stability Index drift monitor (M-surface, "
    "the model-monitoring twin of m_calibration_bins): events split at "
    "a fixed date into reference vs current, value histogrammed into 10 "
    "fixed-width bins, per-bin PSI term (p_cur-p_ref)*ln(p_cur/p_ref) "
    "with an epsilon floor. ONE map-side-combinable groupBy(bin) "
    "computes both sides' counts (conditional sums — no second scan, no "
    "join); normalizers are unbounded-frame window sums over the "
    "10-row bin table. Constant-size state at any data scale.",
)
def m15_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    cutoff = F.lit(_PSI_CUTOFF).cast("timestamp")
    binned = ev.select(
        F.least(F.floor(F.col("value") / 50.0).cast("int"), F.lit(9)).alias("bin"),
        (F.col("ts") < cutoff).cast("int").alias("is_ref"),
    )
    cnts = binned.groupBy("bin").agg(
        F.sum("is_ref").cast("long").alias("ref_cnt"),
        F.sum(1 - F.col("is_ref")).cast("long").alias("cur_cnt"),
    )
    w = Window.partitionBy()
    # try_divide: an all-current (or all-reference) corpus makes a
    # normalizer 0, where plain `/` is an ANSI DIVIDE_BY_ZERO error and
    # DuckDB returns NULL (r14 events-table fuzz find) — try_divide is
    # exactly DuckDB's zero-divisor semantics.
    p_ref = F.try_divide(
        F.col("ref_cnt"), F.sum("ref_cnt").over(w).cast("double")
    )
    p_cur = F.try_divide(
        F.col("cur_cnt"), F.sum("cur_cnt").over(w).cast("double")
    )
    psi = (p_cur - p_ref) * F.log(
        F.greatest(p_cur, F.lit(1e-6)) / F.greatest(p_ref, F.lit(1e-6))
    )
    return (
        cnts.select(
            "bin",
            "ref_cnt",
            "cur_cnt",
            F.round(p_ref, 6).alias("p_ref"),
            F.round(p_cur, 6).alias("p_cur"),
            F.round(psi, 6).alias("psi_term"),
        )
        .orderBy("bin")
    )


@register(
    "a28_seasonal_anomaly",
    oracle="""
    WITH enriched AS (
      SELECT event_id, value,
        AVG(value) OVER (PARTITION BY dayofweek(ts) + 1, hour(ts)) AS baseline
      FROM events
    )
    SELECT event_id, ROUND(value, 6) AS value, ROUND(baseline, 6) AS baseline,
      ROUND(value - baseline, 6) AS residual
    FROM enriched
    ORDER BY ROUND(abs(value - baseline), 6) DESC, event_id
    LIMIT 50
    """,
    description="Seasonal-baseline anomaly detection (A-surface time-"
    "series family): per-(day-of-week, hour) mean value as the seasonal "
    "baseline, top-50 events by absolute residual. The baseline is a "
    "168-row aggregate BROADCAST back onto the stream (explicit "
    "broadcast join — never a window sort over the raw events, which "
    "would shuffle the full table into 168 skewed partitions at scale); "
    "the only full-data ordering is the bounded top-k. Oracle uses the "
    "equivalent partition-window AVG; DuckDB dayofweek is offset +1 to "
    "Spark's Sunday=1 convention.",
)
def a28_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    keyed = ev.select(
        "event_id",
        "value",
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").alias("hr"),
    )
    baseline = keyed.groupBy("dow", "hr").agg(F.avg("value").alias("baseline"))
    resid = F.col("value") - F.col("baseline")
    return (
        keyed.join(F.broadcast(baseline), ["dow", "hr"])
        .select(
            "event_id",
            F.round("value", 6).alias("value"),
            F.round("baseline", 6).alias("baseline"),
            F.round(resid, 6).alias("residual"),
        )
        .orderBy(F.round(F.abs(F.col("residual")), 6).desc(), "event_id")
        .limit(50)
    )


@register(
    "g3_label_propagation",
    oracle="""
    WITH b0 AS (
      SELECT DISTINCT user_id AS uid, event_type, date_trunc('hour', ts) AS h
      FROM events
    ),
    b AS (
      SELECT uid, event_type, h FROM (
        SELECT uid, event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type, h
                                  ORDER BY uid) AS rn
        FROM b0) t WHERE rn <= 5
    ),
    e AS (
      SELECT DISTINCT x.uid AS u, y.uid AS v
      FROM b x JOIN b y USING (event_type, h) WHERE x.uid < y.uid
    ),
    nbr AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
    l0 AS (
      SELECT node, node AS label FROM (
        SELECT u AS node FROM e UNION SELECT v FROM e)
    ),
    l1 AS (
      SELECT n.node, LEAST(n.label, COALESCE(MIN(l.label), n.label)) AS label
      FROM l0 n LEFT JOIN nbr ON nbr.a = n.node
                LEFT JOIN l0 l ON l.node = nbr.b
      GROUP BY n.node, n.label
    ),
    l2 AS (
      SELECT n.node, LEAST(n.label, COALESCE(MIN(l.label), n.label)) AS label
      FROM l1 n LEFT JOIN nbr ON nbr.a = n.node
                LEFT JOIN l1 l ON l.node = nbr.b
      GROUP BY n.node, n.label
    ),
    l3 AS (
      SELECT n.node, LEAST(n.label, COALESCE(MIN(l.label), n.label)) AS label
      FROM l2 n LEFT JOIN nbr ON nbr.a = n.node
                LEFT JOIN l2 l ON l.node = nbr.b
      GROUP BY n.node, n.label
    )
    SELECT node, label FROM l3 ORDER BY node
    """,
    description="Bounded-round min-label propagation (graph family, with "
    "g1_pagerank/g2_triangles/the components fixpoint): 3 SYNCHRONOUS "
    "rounds of label(v) <- min(label(v), min over neighbors) on the same "
    "bucket-capped co-occurrence graph as g2 (cap mirrored in the "
    "oracle). A fixed round count keeps the lazy plan bounded and the "
    "semantics oracle-replayable as 3 chained CTEs — the deterministic "
    "complement to the run-to-fixpoint large-star/small-star components. "
    "Per round: one join keyed on the neighbor list + one groupBy(node) "
    "min — the neighbor list is persisted ONCE (cachereg) and reused by "
    "every round, so iterations never recompute the edge subtree.",
)
def g3_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    b0 = ev.select(
        F.col("user_id").alias("uid"),
        "event_type",
        F.date_trunc("hour", "ts").alias("h"),
    ).distinct()
    cap_w = Window.partitionBy("event_type", "h").orderBy("uid")
    b = (
        b0.withColumn("__rn", F.row_number().over(cap_w))
        .filter(F.col("__rn") <= 5)
        .drop("__rn")
    )
    x = b.select(F.col("uid").alias("u"), "event_type", "h")
    y = b.select(F.col("uid").alias("v"), "event_type", "h")
    edges = (
        x.join(y, on=["event_type", "h"])
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    nbr = (
        edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionByName(edges.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .persist()
    )
    cachereg.register("plans.wave5.labelprop", nbr)
    labels = (
        nbr.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    # labels is referenced twice per round (lineage doubles per round),
    # but with nbr persisted the replayed subtrees are all node-sized
    # joins — measured FASTER re-executed than per-round persists (1.5 s
    # vs 2.8 s at sf1: three rounds stay inside one codegen pipeline,
    # per-round caching breaks the fusion). g4_bfs_khop measures the
    # opposite; the two document the tradeoff's both sides.
    for _ in range(3):
        contrib = (
            nbr.join(labels, nbr["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("__nl"))
        )
        labels = (
            labels.join(contrib, labels["node"] == contrib["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("__nl"), F.col("label"))
                ).alias("label"),
            )
        )
    return labels.orderBy("node")


@register(
    "a29_robust_zscore",
    oracle="""
    WITH med AS (
      SELECT user_id, median(value) AS med
      FROM events GROUP BY user_id
    ),
    dev AS (
      SELECT e.event_id, e.user_id, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (user_id)
    ),
    mad AS (
      SELECT user_id, median(adev) AS mad FROM dev GROUP BY user_id
    )
    SELECT d.event_id, d.user_id, ROUND(d.value, 6) AS value,
      ROUND(0.6745 * (d.value - d.med) / m.mad, 6) AS robust_z
    FROM dev d JOIN mad m USING (user_id)
    WHERE m.mad > 0
    ORDER BY ROUND(abs(0.6745 * (d.value - d.med) / m.mad), 6) DESC, d.event_id
    LIMIT 50
    """,
    description="Robust z-score outliers (A-surface statistics family): "
    "per-user median + MAD (median absolute deviation), consistency "
    "constant 0.6745, top-50 by |z| — the heavy-tail-safe twin of the "
    "mean/stddev z-score. Two exact-percentile aggregates (Spark "
    "percentile() is the exact interpolating form, matching DuckDB "
    "median) with the per-user median/MAD tables BROADCAST back — "
    "per-user cardinality, not event cardinality, so the joins are "
    "dimension-sized at any scale; MAD=0 users excluded on both sides.",
)
def a29_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "value")
    med = ev.groupBy("user_id").agg(F.expr("percentile(value, 0.5)").alias("med"))
    dev = ev.join(F.broadcast(med), "user_id").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("user_id").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    z = F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        dev.join(F.broadcast(mad), "user_id")
        .filter(F.col("mad") > 0)
        .select(
            "event_id",
            "user_id",
            F.round("value", 6).alias("value"),
            F.round(z, 6).alias("robust_z"),
        )
        .orderBy(F.round(F.abs(z), 6).desc(), "event_id")
        .limit(50)
    )


@register(
    "a31_sequence_pattern",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
        LEAD(event_type, 1) OVER w AS e1,
        LEAD(event_type, 2) OVER w AS e2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_seq
    FROM seq
    WHERE event_type = 'view' AND e1 = 'click' AND e2 = 'purchase'
    GROUP BY user_id
    ORDER BY user_id
    """,
    description="Consecutive-sequence pattern matching (W/A-surface, the "
    "MATCH_RECOGNIZE-lite adjacency complement to a12_funnel_steps' "
    "min-timestamp ordering): per user, count strictly ADJACENT "
    "view->click->purchase runs in the (ts, event_id)-ordered stream "
    "via two stacked lead() windows — one shuffle on user_id shared by "
    "both leads and the final count. The funnel asks 'did the stages "
    "ever happen in order'; this asks 'how often did they happen "
    "back-to-back', which only adjacency windows express.",
)
def a31_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e1"),
        F.lead("event_type", 2).over(w).alias("e2"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "view")
            & (F.col("e1") == "click")
            & (F.col("e2") == "purchase")
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_seq"))
        .orderBy("user_id")
    )
