"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring, token counting and
document fingerprinting over a ``documents(doc_id, text, …)`` table. All
built-in string/array functions and higher-order lambdas — JVM-side and
whole-stage-codegen'd, no Python in the hot path — so the same plan holds
at 100 TB (a pure map stage, no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
    return F.size(tokenize(text)).cast("long")


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
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


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
