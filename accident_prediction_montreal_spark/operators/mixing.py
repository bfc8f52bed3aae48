"""Temperature-based corpus mixing (north-star LLM-pipeline extension):
re-weight a multi-domain corpus so low-resource domains are up-sampled
— the standard multilingual/multi-domain pretraining recipe
(p_d ∝ share_d^τ, τ<1 flattens the distribution; τ=1 is proportional,
τ=0 is uniform).

Scale shape: the per-domain stats frame is ~|domains| rows (tiny), so
``temperature_sample`` broadcasts it and the corpus is touched in ONE
map-side pass — no shuffle of the 100-TB side at all. Doc selection is
a deterministic integer LCG over the id (not ``rand()``), so samples
are reproducible run-to-run, partition-layout-independent, and exactly
checkable by a SQL oracle.

Cross-engine determinism notes (why the arithmetic looks pedantic):
  * τ=0.5 uses ``sqrt`` — IEEE-exact in every engine, unlike ``pow``
    (not correctly rounded; last-ulp differences across libm
    implementations could flip a rounding or sampling boundary);
  * weights are rounded to 12 decimals and summed as DECIMAL(20,12) —
    exact and order-independent, so the normalizing denominator is
    bit-identical regardless of partitioning or engine;
  * the LCG multiplies ``(id % 1000003) * 2654435761`` — bounded by
    ~2.7e15, no int64 overflow for any id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_LCG_MOD_IN = 1000003
_LCG_MULT = 2654435761
_LCG_ADD = 12345
_LCG_MOD_OUT = 1000000007


def lcg_uniform(id_col: Column | str) -> Column:
    """Deterministic pseudo-uniform in [0,1) from an integer id — exact
    int64 arithmetic, reproducible across engines and partitionings.

    Uses a positive modulus fold (``(x % m + m) % m``), because SQL ``%``
    keeps the dividend's sign: a plain ``id % m`` would make every
    NEGATIVE id produce u < 0, silently landing all such rows in the
    first split/below every sampling threshold. For non-negative ids the
    fold is the identity, so SQL oracles over natural keys can mirror
    the plain expression.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    folded = (c % _LCG_MOD_IN + _LCG_MOD_IN) % _LCG_MOD_IN
    u = folded * F.lit(_LCG_MULT) + F.lit(_LCG_ADD)
    return (u % _LCG_MOD_OUT).cast("double") / F.lit(float(_LCG_MOD_OUT))


def temperature_mix_rates(
    docs: DataFrame,
    domain_col: str = "source",
    temperature: float = 0.5,
    target_frac: float = 0.5,
) -> DataFrame:
    """Per-domain mixing table: (domain, n_docs, p_share, p_tau,
    sample_rate).

    p_share = domain's corpus share; p_tau ∝ p_share^τ (normalized);
    sample_rate = expected per-doc keep probability so the realized
    sample totals ``target_frac`` of the corpus distributed by p_tau
    (capped at 1.0 — up-sampling beyond 1 epoch means repetition, which
    is the caller's policy decision, not a Bernoulli rate).
    """
    stats = docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    everything = Window.partitionBy()
    total = F.sum("n_docs").over(everything).cast("double")
    p_share = F.col("n_docs").cast("double") / total
    if temperature == 0.5:
        raw = F.sqrt(p_share)  # IEEE-exact, engine-independent
    else:
        raw = F.pow(p_share, F.lit(float(temperature)))
    # Exact, order-independent normalizer: round to 12 decimals, sum as
    # DECIMAL — the denominator is then bit-identical in any engine.
    weighted = stats.withColumn("p_share", p_share).withColumn(
        "pw", F.round(raw, 12).cast("decimal(20,12)")
    )
    denom = F.sum("pw").over(everything).cast("double")
    p_tau = F.col("pw").cast("double") / denom
    n_total = F.sum("n_docs").over(everything).cast("double")
    rate = F.least(
        F.lit(1.0),
        F.lit(float(target_frac)) * n_total * p_tau / F.col("n_docs").cast("double"),
    )
    return weighted.select(
        "domain",
        "n_docs",
        "p_share",
        p_tau.alias("p_tau"),
        rate.alias("sample_rate"),
    )


def hash_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
) -> DataFrame:
    """Deterministic id-hash split: adds a ``split`` column assigning each
    row to a named bucket by cumulative-weight thresholds over
    ``lcg_uniform(id)``.

    This is the production replacement for ``randomSplit`` at scale:
    randomSplit draws per-partition, so the SAME row can land in a
    different bucket when partitioning changes (re-shuffles, AQE,
    cluster resize) — an id-hash split is a pure function of the row's
    id, stable across runs, engines, and layouts, and needs no extra
    pass (randomSplit's two DataFrames each re-scan the parent). One
    withColumn; filters on ``split`` stay pushable.
    """
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    total = float(sum(weights))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = lcg_uniform(id_col)
    acc = 0.0
    expr = F.lit(names[-1])  # last bucket takes the remainder
    cuts: list[tuple[float, str]] = []
    for w, nm in zip(weights[:-1], names[:-1]):
        acc += w / total
        cuts.append((acc, nm))
    for cut, nm in reversed(cuts):
        expr = F.when(u < F.lit(cut), F.lit(nm)).otherwise(expr)
    return docs.withColumn("split", expr)


def temperature_sample(
    docs: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    temperature: float = 0.5,
    target_frac: float = 0.5,
) -> DataFrame:
    """The corpus rows kept by the temperature mix — deterministic
    (LCG over ``id_col``), one broadcast join, no corpus shuffle."""
    rates = temperature_mix_rates(docs, domain_col, temperature, target_frac)
    return docs.join(
        F.broadcast(rates.withColumnRenamed("domain", domain_col)),
        domain_col,
    ).filter(lcg_uniform(id_col) < F.col("sample_rate")).drop(
        "n_docs", "p_share", "p_tau", "sample_rate"
    )
