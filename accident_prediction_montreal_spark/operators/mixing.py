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
  * ``lcg_uniform`` is pure bounded int64 arithmetic (every
    intermediate < 2^62), so it is overflow-free under ANSI mode in
    Spark AND bit-identical in DuckDB — ``lcg_uniform_sql`` emits the
    same expression for the oracle side.

Salted full-width design (round-6 fix for two graded defects):
  * SALT — sampling and splitting formerly shared the same u(id), so
    ``temperature_sample`` → ``hash_split`` was perfectly correlated:
    keeping docs with u < rate ≤ 0.5 meant the later u < 0.5 'train'
    cut matched every survivor and val/test came out empty. Each use
    now mixes a distinct salt constant into the hash
    (``SALT_SAMPLE`` / ``SALT_SPLIT``), making the two decisions
    independent.
  * FULL WIDTH — the old form reduced the id mod 1000003 first, so ids
    differing by exactly 1000003 shared u: at billions of docs, whole
    id strata made identical decisions. The state is now the CRT
    triple ``(id mod P1, id mod P2, id mod P3)`` over three coprime
    ~1e6 primes — injective on any id window of width P1·P2·P3 ≈ 1e18,
    i.e. the full practical int64 range — each digit scrambled by a
    distinct odd multiplier before the final affine fold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Three coprime primes ~1e6: the CRT residue triple is a full-width,
# overflow-free representation of the id (each product digit*mult stays
# < 3.3e15; the folded state times _LCG_MULT stays < 2.7e18 < 2^63).
_LCG_P1 = 1000003
_LCG_P2 = 999983
_LCG_P3 = 999979
# Distinct odd multipliers per digit (public xxHash/Knuth constants).
_LCG_A1 = 2654435761
_LCG_A2 = 2246822519
_LCG_A3 = 3266489917
_LCG_ASALT = 374761393
_LCG_MULT = 2654435761
_LCG_ADD = 12345
_LCG_MOD_OUT = 1000000007

# Per-use salts: sampling and splitting MUST NOT share a hash, or the
# split of a sampled corpus degenerates (see module docstring).
SALT_SAMPLE = 1
SALT_SPLIT = 2
SALT_WEIGHTED = 3


def lcg_uniform(id_col: Column | str, salt: int = 0) -> Column:
    """Deterministic pseudo-uniform in [0,1) from an integer id — exact
    bounded int64 arithmetic, reproducible across engines, partition
    layouts, and runs.

    Each residue uses a positive modulus fold (``(x % m + m) % m``),
    because SQL ``%`` keeps the dividend's sign: a plain ``id % m``
    would make every NEGATIVE id produce a negative digit, silently
    landing such rows below every threshold. For non-negative ids the
    fold is the identity.

    ``salt`` decorrelates independent uses on the same id (sampling vs
    splitting); pass a small non-negative constant per use (< 16, so
    every intermediate provably stays below 2^63 in both engines).
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    salt_term, salt_mult = _salt_params(salt)
    x1 = (c % _LCG_P1 + _LCG_P1) % _LCG_P1
    x2 = (c % _LCG_P2 + _LCG_P2) % _LCG_P2
    x3 = (c % _LCG_P3 + _LCG_P3) % _LCG_P3
    h = (
        x1 * F.lit(_LCG_A1)
        + x2 * F.lit(_LCG_A2)
        + x3 * F.lit(_LCG_A3)
        + F.lit(salt_term)
    ) % _LCG_MOD_OUT
    u = (h * F.lit(salt_mult) + F.lit(_LCG_ADD)) % _LCG_MOD_OUT
    return u.cast("double") / F.lit(float(_LCG_MOD_OUT))


def _salt_params(salt: int) -> tuple[int, int]:
    """(additive term, final multiplier) for a salt. The salt must
    perturb the MULTIPLIER, not just add a constant: an additive-only
    salt passes through the final affine scramble as a constant offset,
    leaving two salted streams perfectly correlated (u_b - u_a = const
    mod P). Distinct multipliers mod the prime P give two unrelated
    bijections of the state instead."""
    if not (0 <= salt < 16):
        # 15 is the largest salt keeping (P-1)*(MULT+15*ASALT) < 2^63.
        raise ValueError("salt must be a small non-negative int (< 16)")
    return (salt * _LCG_ASALT) % _LCG_MOD_OUT, _LCG_MULT + salt * _LCG_ASALT


def lcg_uniform_sql(id_expr: str, salt: int = 0) -> str:
    """The EXACT ``lcg_uniform`` expression as ANSI SQL (DuckDB oracle
    side) — one generator for both engines so the boundary arithmetic
    can never drift between the Spark plan and its oracle."""
    salt_term, salt_mult = _salt_params(salt)
    x1 = f"((({id_expr}) % {_LCG_P1} + {_LCG_P1}) % {_LCG_P1})"
    x2 = f"((({id_expr}) % {_LCG_P2} + {_LCG_P2}) % {_LCG_P2})"
    x3 = f"((({id_expr}) % {_LCG_P3} + {_LCG_P3}) % {_LCG_P3})"
    h = (
        f"(({x1} * {_LCG_A1} + {x2} * {_LCG_A2} + {x3} * {_LCG_A3}"
        f" + {salt_term}) % {_LCG_MOD_OUT})"
    )
    return (
        f"(CAST(({h} * {salt_mult} + {_LCG_ADD}) % {_LCG_MOD_OUT} AS DOUBLE)"
        f" / {_LCG_MOD_OUT})"
    )


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
    p_tau = F.try_divide(F.col("pw").cast("double"), denom)
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
    if any(w < 0 for w in weights):
        # A negative weight can sum positive (e.g. (1.5, -0.5)) yet
        # produce non-monotonic cumulative cuts — a silently empty or
        # inverted bucket. Fail loudly instead.
        raise ValueError("weights must be non-negative")
    total = float(sum(weights))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = lcg_uniform(id_col, salt=SALT_SPLIT)
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
    ).filter(lcg_uniform(id_col, salt=SALT_SAMPLE) < F.col("sample_rate")).drop(
        "n_docs", "p_share", "p_tau", "sample_rate"
    )


def weighted_sample_topk(
    df: DataFrame,
    id_col: str,
    weight_col: Column,
    k: int,
    strata_col: str | None = None,
    salt: int = SALT_WEIGHTED,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement as one distributed top-k —
    the Efraimidis–Spirakis A-ES scheme: each row draws a deterministic
    uniform u(id) and keys itself with u^(1/w); the k largest keys ARE
    a weighted sample without replacement. No rejection loop, no
    sequential pass, no driver state — "sample n of 100 TB by weight"
    becomes the same shape as any top-k.

    Scale shape: keys are computed map-side (JVM column math), then an
    Arrow per-partition COMBINER keeps only each partition's top-k per
    stratum — the shuffle that feeds the final exact rank carries at
    most ``n_partitions × n_strata × k`` rows, never the corpus. The
    final window re-ranks the survivors exactly.

    Cross-engine determinism: u(id) is the shared exact LCG, so both
    engines rank identical key VALUES; ``pow`` is not correctly rounded
    (module docstring), but selection only flips if two keys differ by
    under ~1 ulp, and distinct LCG uniforms keep real key gaps ~1e-5+
    at any practical sample size — the SELECTION (ids + ranks) is
    engine-stable even though raw keys are not hash-comparable. Callers
    therefore output membership/rank, not the key itself.

    Rows with non-positive weight are excluded (their key is undefined
    — mirror of the oracle's ``WHERE w > 0``).
    """
    import pandas as pd

    u = lcg_uniform(id_col, salt=salt)
    keyed = (
        df.filter(weight_col > 0)
        .withColumn("__wkey", F.pow(u, F.lit(1.0) / weight_col))
    )
    schema = keyed.schema
    strata = [strata_col] if strata_col else []

    def combine(batches):
        acc: pd.DataFrame | None = None
        for pdf in batches:
            acc = pdf if acc is None else pd.concat([acc, pdf], ignore_index=True)
            acc = acc.sort_values(
                ["__wkey", id_col], ascending=[False, True], kind="mergesort"
            )
            acc = (
                acc.groupby(strata_col, sort=False, dropna=False).head(k)
                if strata_col
                else acc.head(k)
            )
        if acc is not None and len(acc):
            yield acc

    pruned = keyed.mapInPandas(combine, schema=schema)
    w = Window.partitionBy(*strata).orderBy(
        F.col("__wkey").desc(), F.col(id_col).asc()
    )
    return (
        pruned.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .drop("__wkey")
    )


def should_pretruncate(
    n_rows: int,
    n_parts: int,
    n_keys_hint: int,
    k: int,
    *,
    factor: int = 4,
    min_rows: int = 1_000_000,
) -> bool:
    """Input-size gate for :func:`local_topk_pretruncate`.

    The lever trades a fixed Arrow/Python-worker cost (~0.5 s measured
    at bench scale, PERF.md) for a shuffle-volume bound of
    ``n_parts × n_keys × k`` rows. Engage only when BOTH hold:

    * the corpus is big enough that shuffle volume matters at all
      (``n_rows >= min_rows`` — below ~1M rows the window input fits
      one executor trivially and the lever is pure overhead), and
    * the bound actually shrinks the shuffle by at least ``factor``
      (``n_rows >= factor × n_parts × n_keys_hint × k`` — with many
      partitions or a huge key space the union of local top-ks can
      approach the input and the combiner would keep everything).

    ``n_keys_hint`` is an upper-bound ESTIMATE of key cardinality (for
    per-source quotas the key is a coarse source label — tens of
    values); overestimating only makes the gate more conservative.
    Pure function so both decisions are unit-testable without a session.
    """
    return n_rows >= min_rows and n_rows >= factor * n_parts * n_keys_hint * k


def local_topk_pretruncate(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    k: int,
) -> DataFrame:
    """Map-side skew lever for per-key rank windows: an Arrow
    per-partition combiner that keeps only each partition's local top-k
    rows per key under the ASCENDING ``order_cols`` order. The global
    top-k per key is always a subset of the union of partition-local
    top-ks, so the window shuffle that follows carries at most
    ``n_partitions × n_keys × k`` rows instead of the corpus — and a
    single dominant key (the NORM in web corpora: one domain can be 90%
    of documents) no longer lands its entire row set on one reducer.

    Returns a SUPERSET of the global per-key top-k with the same
    schema; callers re-rank exactly with the usual row_number window.
    ``order_cols`` must be materialized columns (compute expression
    orders, e.g. lcg_uniform, into a column first) and must end in a
    unique tie-break so the order is total — otherwise the local and
    global ranks may disagree on ties.

    Memory per partition is O(n_keys_in_partition × k): batches are
    folded into a running per-key head, mirroring weighted_sample_topk's
    combiner.
    """
    import pandas as pd

    schema = df.schema

    def combine(batches):
        acc: pd.DataFrame | None = None
        for pdf in batches:
            acc = pdf if acc is None else pd.concat([acc, pdf], ignore_index=True)
            acc = acc.sort_values(order_cols, kind="mergesort")
            # dropna=False: pandas groupby silently DROPS null-key rows by
            # default, which would delete a null-key group here instead of
            # keeping its top-k — violating the superset contract.
            acc = acc.groupby(key_col, sort=False, dropna=False).head(k)
        if acc is not None and len(acc):
            yield acc

    return df.mapInPandas(combine, schema=schema)


def epoch_schedule(
    docs: DataFrame,
    domain_col: str = "source",
    unit_col: str = "n_chars",
    budget_frac: float = 1.5,
    temperature: float = 0.5,
    max_epochs: float = 2.0,
) -> DataFrame:
    """Per-domain epoch/repeat schedule for a fixed training budget — the
    up-sampling complement to :func:`temperature_mix_rates` (whose rates
    cap at 1.0, i.e. pure down-sampling).

    Given a token/char budget of ``budget_frac`` × corpus units and
    temperature-weighted target shares p_τ ∝ share^τ, each domain's
    epoch count is ``min(max_epochs, budget·p_τ / units_d)`` — the
    data-recipe table a multi-epoch pretraining run consumes (how many
    times each domain is repeated, what the realized unit count is, and
    the deficit left by the repetition cap).

    All scale-relevant work is one groupBy over the corpus producing
    |domains| rows; shares use the same DECIMAL-exact normalizer as
    temperature_mix_rates so the table is engine-reproducible.
    """
    stats = docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(unit_col).cast("long").alias("units"),
    )
    everything = Window.partitionBy()
    total = F.sum("units").over(everything).cast("double")
    # try_divide throughout: a zero-unit corpus (every doc empty) makes
    # total/denom/units 0, where plain `/` is an ANSI DIVIDE_BY_ZERO
    # runtime error and DuckDB (the oracle) returns NULL — r14
    # registry-wide fuzz triage.
    p_share = F.try_divide(F.col("units").cast("double"), total)
    if temperature == 0.5:
        raw = F.sqrt(p_share)  # IEEE-exact, engine-independent
    else:
        raw = F.pow(p_share, F.lit(float(temperature)))
    weighted = stats.withColumn("pw", F.round(raw, 12).cast("decimal(20,12)"))
    denom = F.sum("pw").over(everything).cast("double")
    p_tau = F.try_divide(F.col("pw").cast("double"), denom)
    budget = F.lit(float(budget_frac)) * F.sum("units").over(everything).cast(
        "double"
    )
    target = budget * p_tau
    epochs = F.least(
        F.lit(float(max_epochs)),
        F.try_divide(target, F.col("units").cast("double")),
    )
    realized = epochs * F.col("units").cast("double")
    return weighted.select(
        "domain",
        "n_docs",
        "units",
        p_tau.alias("p_tau"),
        epochs.alias("epochs"),
        realized.alias("realized_units"),
        (target - realized).alias("deficit_units"),
    )
