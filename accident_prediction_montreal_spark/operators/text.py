"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring, token counting and
document fingerprinting over a ``documents(doc_id, text, …)`` table. All
built-in string/array functions and higher-order lambdas — JVM-side and
whole-stage-codegen'd, no Python in the hot path — so the same plan holds
at 100 TB (a pure map stage, no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny, deliberately-unambiguous stopword sets per language. The heuristic
# scores a document by distinct stopword hits and picks the argmax.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with", "for", "was"],
    "fr": ["le", "la", "les", "et", "de", "des", "est", "dans", "pour", "une"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "für"],
    "es": ["el", "los", "las", "es", "en", "que", "por", "una", "con", "para"],
}


def tokenize(text: Column | str) -> Column:
    """Lowercased whitespace tokens; empty string → empty array."""
    text = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(F.lower(text))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(text: Column | str) -> Column:
    # NULL text counts ZERO tokens (size(NULL array) is NULL): keeps
    # NULLs out of every downstream ordering/deciling — Spark sorts
    # NULLS FIRST, DuckDB NULLS LAST, so a NULL token count silently
    # splits otherwise-identical ntile assignments between the mirrors
    # (r14 registry-wide fuzz triage).
    return F.coalesce(F.size(tokenize(text)), F.lit(0)).cast("long")


def text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-signal columns: token/char counts and ratio features.

    The classic pre-training quality filters: mean word length, punctuation
    density, digit density, uppercase density, English-stopword ratio.
    """
    text = F.col(text_col)
    toks = tokenize(text)
    n_chars = F.length(text).cast("long")
    n_tokens = F.size(toks).cast("long")
    count_matches = lambda pat: (  # noqa: E731
        n_chars - F.length(F.regexp_replace(text, pat, ""))
    )
    en = [F.lit(w) for w in STOPWORDS["en"]]
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*en)))
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "mean_word_len",
            F.when(n_tokens > 0, F.length(F.concat_ws("", toks)) / n_tokens).otherwise(0.0),
        )
        .withColumn(
            "punct_ratio",
            F.when(n_chars > 0, count_matches(r"[,.;:!?]") / n_chars).otherwise(0.0),
        )
        .withColumn(
            "digit_ratio",
            F.when(n_chars > 0, count_matches(r"[0-9]") / n_chars).otherwise(0.0),
        )
        .withColumn(
            "stopword_ratio",
            F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(0.0),
        )
    )


def language_id(text: Column | str) -> Column:
    """Best-guess language code by stopword-hit count; ties break alphabetically.

    Pure column expression: per language, count tokens in its stopword set;
    pick the language with the max count ('und' when nothing matches).
    """
    toks = tokenize(text)
    scored = [
        F.struct(
            F.size(F.filter(toks, lambda t: t.isin(*[F.lit(w) for w in words]))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(STOPWORDS.items())
    ]
    # array_max on (hits, lang) structs orders by hits then lang; we want
    # ties to pick the alphabetically-first lang, so compare on
    # (hits, reversed-rank) — simplest deterministic form: reduce manually.
    best = scored[0]
    for cand in scored[1:]:
        best = F.when(cand["hits"] > best["hits"], cand).otherwise(best)
    text_col = F.col(text) if isinstance(text, str) else text
    # NULL text -> NULL (SQL-function NULL propagation; the oracle's
    # CASE chain yields NULL there too — r14 registry-wide fuzz triage).
    # 'und' stays the answer for present-but-matchless text.
    return F.when(text_col.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    )


def fingerprint(text: Column | str) -> Column:
    """Canonical md5 fingerprint: lowercase, strip non-alphanumerics, collapse spaces.

    The exact-dedup key for near-identical formatting variants (the
    "document fingerprinting" operator; exact content hash is md5(text)).
    """
    text = F.col(text) if isinstance(text, str) else text
    norm = F.lower(text)
    norm = F.regexp_replace(norm, r"[^a-z0-9\s]", "")
    norm = F.trim(F.regexp_replace(norm, r"\s+", " "))
    return F.md5(norm)


# BPE-ish pre-tokenizer: letter runs, digit runs, punctuation runs, each
# optionally preceded by one space (the GPT-2 pattern family, restricted
# to ASCII classes so the same regex runs identically on Java regex and
# RE2-based SQL engines).
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_count(text: Column | str) -> Column:
    """Token count under the BPE-ish regex (north-star token counting).

    Whitespace tokenization (``token_count``) undercounts for BPE-style
    vocabularies; this matches the pre-tokenization split those
    vocabularies start from. Pure JVM regexp — no UDF.
    """
    text = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0))).cast(
        "long"
    )


def rolling_hash(text: Column | str, modulus: int = 1_000_003) -> Column:
    """Polynomial rolling hash over the character stream (north-star
    document fingerprinting, rolling-hash form).

    h = fold(h * 31 + ascii(char)) mod ``modulus`` — the Rabin-Karp
    polynomial evaluated left-to-right with JVM higher-order functions
    (sequence → transform → aggregate), no UDF. The modulus keeps every
    intermediate below 2^63 so the fold is overflow-safe under ANSI
    mode. Empty/null text hashes to 0.
    """
    col = F.col(text) if isinstance(text, str) else text
    # NB: F.sequence(1, 0) counts DOWN (negative default step) — guard
    # the empty case instead of relying on an empty sequence.
    folded = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.ascii(col.substr(i, F.lit(1))).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda h, c: (h * 31 + c) % modulus,
    )
    return F.when(F.length(col) > 0, folded).otherwise(F.lit(0).cast("long"))


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Overlapping token-window chunks: (id, chunk_id, chunk_text, n_tokens).

    The context-window splitting step of a pre-training pipeline: chunk k
    covers tokens [k*stride + 1, k*stride + chunk_size]; the last start is
    the first one whose window reaches the end of the document, so the
    tail is always covered and no chunk is a strict subset of its
    predecessor. Empty documents emit no chunks.

    Pure map stage — sequence/transform/slice/posexplode, no shuffle, no
    UDF: output size scales with input tokens x (chunk_size/stride), the
    same plan at 100 TB.
    """
    if chunk_size <= 0 or stride <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    # number of strides past the first window, ceil((n - size) / stride)
    n_extra = F.floor(
        (F.greatest(n - chunk_size, F.lit(0)) + (stride - 1)) / F.lit(stride)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_extra),
        lambda k: F.slice(toks, k * stride + 1, chunk_size),
    )
    return (
        df.where(n > 0)
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk_toks"))
        .select(
            id_col,
            "chunk_id",
            F.concat_ws(" ", "chunk_toks").alias("chunk_text"),
            F.size("chunk_toks").cast("long").alias("n_tokens"),
        )
    )


def tfidf_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per document: (id, term, tf, df, tfidf, rank).

    Smoothed sklearn-style idf = ln((N+1)/(df+1)) + 1. Three shuffles,
    each on a small key: explode -> groupBy(doc, term) with map-side
    combine (never shuffles raw text, only (doc, term, count)); document
    frequency as count-over-window on the distinct (doc, term) rows —
    reusing that shuffle's output rather than a groupBy+join-back; and
    the per-doc top-k row_number. The corpus size N is a one-row
    aggregate broadcast into the score expression. Ties break by term
    ascending, so top-k is deterministic.
    """
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = (
        df.select(F.col(id_col).alias("doc"), F.explode(tokenize(F.col(text_col))).alias("term"))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")).cast("long"))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf") * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1),
        )
    )
    w = Window.partitionBy("doc").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("doc").alias(id_col),
            "term",
            "tf",
            "df",
            F.round("tfidf", 6).alias("tfidf"),
            "rank",
        )
    )


def word_gram_hashes(text: Column | str, n: int = 2) -> Column:
    """ALL word n-grams (duplicates kept) as 64-bit hashes (array<long>).

    The multiset counterpart of dedup.word_shingle_hashes: token hashes
    chained with zip_with, bound once (no HOF re-evaluation), no
    array_distinct — repetition analysis needs the duplicates.
    """
    toks = tokenize(F.col(text) if isinstance(text, str) else text)

    def body(th: Column) -> Column:
        count = F.size(th) - (n - 1)
        safe = F.greatest(count, F.lit(0))
        g = F.slice(th, 1, safe)
        for j in range(1, n):
            g = F.zip_with(g, F.slice(th, j + 1, safe), lambda a, b: F.xxhash64(a, b))
        return g

    # evaluate the token-hash array exactly once (no CSE in HOF lambdas)
    return F.element_at(
        F.transform(F.array(F.transform(toks, lambda t: F.xxhash64(t))), body), 1
    )


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Gopher-style within-document repetition signals over word n-grams.

    Per document (with >= 1 n-gram):
      n_grams, n_distinct, dup_frac = 1 - distinct/total (mass of
      repeated grams), top_frac = count of the most frequent gram /
      total (boilerplate loops score high on both).

    Rae et al. 2021 (Gopher) filter pre-training text on exactly these
    ratios. explode -> (doc, gram) counts with map-side combine ->
    per-doc aggregate: two bounded shuffles, no text ever shuffled (the
    grams are 8-byte hashes).
    """
    counts = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(word_gram_hashes(F.col(text_col), n)).alias("g"),
        )
        .groupBy("doc", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.groupBy("doc")
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("cnt").alias("top_cnt"),
        )
        .select(
            F.col("doc").alias(id_col),
            "n_grams",
            "n_distinct",
            F.round(1 - F.col("n_distinct") / F.col("n_grams"), 6).alias("dup_frac"),
            F.round(F.col("top_cnt") / F.col("n_grams"), 6).alias("top_frac"),
        )
    )


# PII scrubbing patterns — deliberately backreference/lookaround-free so
# the same pattern runs identically on Java regex (Spark) and RE2-based
# engines (the DuckDB oracle).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def mask_pii(text: Column | str) -> Column:
    """Replace email addresses then phone-shaped digit runs with sentinels.

    The pre-training scrub step: pure JVM regexp_replace chain, no UDF.
    Emails first — a phone-shaped digit run inside an address must not
    split the address before the email pass sees it.
    """
    text = F.col(text) if isinstance(text, str) else text
    masked = F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(masked, PHONE_PATTERN, "<PHONE>")


def vocab_coverage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 16,
    min_coverage_pct: int = 60,
) -> DataFrame:
    """Corpus-vocabulary coverage filter (CCNet/Gopher-style OOV gate).

    Two passes, both scale-safe: (1) token occurrence counts -> top
    ``vocab_size`` tokens (DESC count, ASC token — a total order, so the
    cut is deterministic in any engine); (2) per-document token totals
    with the vocabulary broadcast back, keeping documents whose in-vocab
    token share meets ``min_coverage_pct``. The comparison is integer
    arithmetic (n_in_vocab * 100 >= pct * n_tokens) — no float ratio, so
    the kept set is bit-exact across engines. Documents with zero tokens
    produce no explode rows and are dropped (no coverage evidence).

    At 100 TB the vocabulary aggregate is a map-side-combined count over
    tokens (vocabulary cardinality, not corpus size, bounds the shuffle)
    and the top-V cut is a tiny TakeOrdered; the per-doc pass shuffles
    (doc_id) once. The exploded token stream is intentionally NOT
    persisted — it is corpus-sized, and two streaming passes beat
    materializing it.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("token")
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(vocab_size)
        .select("token")
    )
    flagged = toks.join(
        F.broadcast(vocab.withColumn("__in_vocab", F.lit(1))), "token", "left"
    )
    per_doc = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.coalesce(F.col("__in_vocab"), F.lit(0))).alias("n_in_vocab"),
    )
    return per_doc.filter(
        F.col("n_in_vocab") * 100 >= F.lit(min_coverage_pct) * F.col("n_tokens")
    )


# --- Hashing-trick quality classifier ----------------------------------------

_QC_MOD = 1_000_003  # per-token polynomial hash modulus (matches rolling_hash)
_QC_WMUL = 2_654_435_761  # Knuth multiplicative constant -> bucket weights
_QC_WMOD = 2001  # milli-weights span [-1000, 1000]


def quality_classifier(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """FastText-style linear quality scorer via the hashing trick — the
    model-based document filter of a pretraining pipeline (quality
    classifier stage), expressed entirely in JVM column math.

    Each token hashes through the corpus-standard 31-polynomial
    (``rolling_hash`` convention) into one of ``n_buckets`` feature
    buckets; the bucket's weight is a fixed integer milli-weight derived
    from a Knuth multiplicative mix, so the "trained model" is a pure
    function — no weight table to broadcast, nothing to look up. The
    document score is the exact INTEGER sum of milli-weights (a
    sequential fold over the token array — order-independent because
    integer addition is associative), so ``score_milli`` is bit-equal in
    any engine; the sigmoid probability is the only float and is stable
    to far beyond the 6 rounded decimals.

    Scale shape: one map pass, zero shuffles, no UDF, no explode — the
    per-token fold runs inside a single projection. A real trained
    model swaps the weight function for a broadcast array lookup; the
    plan shape is unchanged.
    """
    toks = tokenize(F.col(text_col))

    def tok_hash(t: Column) -> Column:
        return F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.length(t)),
                lambda i: F.ascii(t.substr(i, F.lit(1))).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda h, c: (h * 31 + c) % _QC_MOD,
        )

    def tok_weight(t: Column) -> Column:
        bucket = tok_hash(t) % n_buckets
        return (bucket * _QC_WMUL) % _QC_WMOD - 1000

    score = F.aggregate(
        F.transform(toks, tok_weight),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    n_tokens = F.size(toks).cast("long")
    margin = F.col("score_milli").cast("double") / (
        F.lit(1000.0) * F.greatest(F.col("n_tokens"), F.lit(1))
    )
    return (
        df.select(id_col, n_tokens.alias("n_tokens"), score.alias("score_milli"))
        .withColumn(
            "prob",
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)), 6) + 0.0,
        )
        .withColumn("keep", (F.col("score_milli") >= 0).cast("long"))
    )


def lm_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style language-model perplexity score (Wenzek et al. 2020
    pattern): an add-1-smoothed unigram LM is fit on the corpus itself
    and every document is scored by its average per-token negative
    log-likelihood and perplexity — the third quality-filter modality
    next to the heuristic signals (text_quality) and the hashed linear
    classifier (quality_classifier).

    Engine-reproducibility: per-token NLL is rounded to 9 decimals and
    summed as DECIMAL(20,9), so the per-document total is exact and
    order-independent; the only floats are ln/exp of identical doubles.

    Scale shape: token counts are one map-side-combined groupBy; the
    (N, V) normalizer is a 1-row broadcast; scoring joins tokens to the
    |vocab|-row count table (hash join on the token — natural-language
    skew concentrates on stopwords, which AQE's skew handling splits)
    and reduces per document. Zero-token documents produce no explode
    rows and are absent, like vocab_coverage.
    """
    toks = tokenize(F.col(text_col))
    ex = df.select(id_col, F.explode(toks).alias("tok"))
    cnt = ex.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = cnt.agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    p = (F.col("c").cast("double") + F.lit(1.0)) / (
        F.col("n").cast("double") + F.col("v").cast("double")
    )
    nll = cnt.crossJoin(F.broadcast(tot)).select(
        "tok", F.round(-F.log(p), 9).cast("decimal(20,9)").alias("q")
    )
    per = (
        ex.join(nll, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("q").alias("s"),
        )
    )
    avg = F.col("s").cast("double") / F.col("n_tokens")
    return per.select(
        id_col,
        "n_tokens",
        (F.round(avg, 6) + 0.0).alias("avg_nll"),
        (F.round(F.exp(avg), 4) + 0.0).alias("ppl"),
    )


def corpus_diff(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot delta: classify every document across two corpus
    versions as ``added`` / ``removed`` / ``changed`` / ``unchanged``
    by comparing md5 CONTENT DIGESTS (byte-identical across engines) —
    the incremental-ingestion primitive that lets downstream stages
    (dedup index maintenance, embedding refresh, decontamination
    re-screens) process only the delta.

    Returns (id_col, status). Scale shape: digests are computed
    MAP-SIDE on each snapshot scan, so the full-outer join's shuffle
    carries (id, 32-byte digest) rows, never text; snapshots
    bucketed/partitioned by id at rest co-locate the join with no
    re-shuffle at all.

    Preconditions: ``id_col`` must be unique within each snapshot (a
    duplicated id cross-matches in the full-outer join and yields one
    status row per pairing); NULL text is allowed — the digest compare
    is null-safe, so NULL<->non-NULL transitions classify as
    ``changed`` and NULL->NULL as ``unchanged`` (property-tested).
    """
    ha = a.select(F.col(id_col).alias("__a_id"), F.md5(text_col).alias("__a_h"))
    hb = b.select(F.col(id_col).alias("__b_id"), F.md5(text_col).alias("__b_h"))
    status = (
        F.when(F.col("__a_id").isNull(), F.lit("added"))
        .when(F.col("__b_id").isNull(), F.lit("removed"))
        # NULL-SAFE compare (<=>): md5(NULL text) is NULL, and a plain
        # != yields NULL for NULL-vs-non-NULL, silently falling through
        # to 'unchanged' — a doc whose text flips between NULL and
        # non-NULL would skip downstream incremental stages. Oracle
        # mirrors with IS DISTINCT FROM.
        .when(~F.col("__a_h").eqNullSafe(F.col("__b_h")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return ha.join(hb, F.col("__a_id") == F.col("__b_id"), "full_outer").select(
        F.coalesce(F.col("__a_id"), F.col("__b_id")).alias(id_col),
        status.alias("status"),
    )
