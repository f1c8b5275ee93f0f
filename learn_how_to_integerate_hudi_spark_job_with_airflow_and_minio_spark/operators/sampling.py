"""Deterministic domain-mix sampling (training-data mixture control).

A 100 TB corpus is a mixture of sources; training recipes prescribe
per-source retention rates (down-weight boilerplate-heavy domains,
keep rare high-quality ones at 1.0). Sampling must be DETERMINISTIC —
rand() changes the dataset every run and breaks dedup/provenance — so
membership is a pure function of the row id: the first 6 hex nibbles of
md5(id) as a uniform fraction in [0, 1). md5 is bit-identical across
engines (the cross-engine oracle technique proven by dedup_simhash),
and k/2^24 with k < 2^24 is exact in double, so the `frac < rate`
decision is reproducible anywhere.

Map-only: no shuffle, no state; the rate lookup folds into a CASE chain
of literals. Scale cost is one md5 per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HASH_SPAN = float(1 << 24)


def hash_fraction(id_col: Column) -> Column:
    """Uniform [0,1) fraction from md5(id): first 6 hex nibbles / 2^24
    (exact in double — power-of-two divisor)."""
    nibbles = F.substring(F.md5(id_col.cast("string")), 1, 6)
    return F.conv(nibbles, 16, 10).cast("long") / F.lit(_HASH_SPAN)


def domain_mix_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> DataFrame:
    """Keep each row iff hash_fraction(id) < its stratum's rate."""
    rate: Column = F.lit(float(default_rate))
    case = None
    for s, r in rates.items():
        cond = F.col(strata_col) == s
        case = F.when(cond, float(r)) if case is None else case.when(cond, float(r))
    if case is not None:
        rate = case.otherwise(float(default_rate))
    return df.where(hash_fraction(F.col(id_col)) < rate)


def retention_maximizing_rates(
    counts: dict[str, int], target: dict[str, float]
) -> dict[str, float]:
    """Per-stratum rates that hit the ``target`` mixture proportions
    while keeping as much data as possible: scale the whole target by
    the largest alpha for which no stratum needs rate > 1.

    Driver-side arithmetic over the per-stratum COUNT row (bounded
    metadata — strata cardinality, not data).
    """
    total = sum(counts.values())
    if total == 0:
        return {s: 1.0 for s in target}
    shares = {s: counts.get(s, 0) / total for s in target}
    alpha = min(
        (shares[s] / t for s, t in target.items() if t > 0 and shares[s] > 0),
        default=0.0,
    )
    return {
        s: min(1.0, (t * alpha) / shares[s]) if shares[s] > 0 else 0.0
        for s, t in target.items()
    }


def weighted_reservoir_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int, seed: int = 0
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): each row draws a deterministic uniform u ∈ (0,1] from
    md5(seed|id) and scores key = -ln(u)/w; the k smallest keys are the
    sample — distributionally identical to sequentially drawing k rows
    with probability ∝ weight, but expressible as a global top-k.

    Scale shape: the key is a map-only expression; ``orderBy(key).
    limit(k)`` compiles to Spark's TakeOrderedAndProject — per-partition
    top-k heaps, then a driver-side merge of p·k rows — no full sort, no
    shuffle of the corpus. Deterministic across runs and engines: md5 is
    bit-identical everywhere and u is an exact dyadic rational; ln/÷ are
    correctly-rounded IEEE doubles, with (key, id) ordering as the
    tie-break.

    Non-positive and NULL weights are EXCLUDED up front: probability ∝
    weight means weight 0 must never be drawn, but its raw key -ln(u)/0
    is NULL in Spark SQL (and -ln(u)/w < 0 for w < 0), and ``F.asc``
    sorts NULLS FIRST — without the filter, exactly the rows that should
    never be sampled would win every slot (e.g. empty documents under a
    length weight)."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string"))),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(_HASH_SPAN)
    key = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.where(F.col(weight_col).cast("double") > 0)
        .withColumn("_es_key", key)
        .orderBy(F.asc("_es_key"), F.asc(id_col))
        .limit(k)
        .drop("_es_key")
    )


def group_split(
    df: DataFrame,
    group_col: Column,
    splits: list[tuple[str, float]],
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe deterministic train/valid/test assignment: the
    split is a pure function of the GROUP (e.g. the exact-dup cluster
    key, the source domain), so every member of a group — all
    near-duplicates of a document, all pages of a site — lands in the
    SAME split. Splitting by row id instead leaks train content into
    eval whenever the corpus has duplicates, which is exactly the
    contamination dedup exists to prevent.

    ``splits`` is an ordered list of ``(name, fraction)``; each group
    hashes to a uniform md5 fraction (the :func:`hash_fraction`
    technique — bit-identical across engines) and takes the first
    split whose cumulative bound exceeds it; the LAST split absorbs
    any remainder (including rounding slack), and a NULL group hashes
    NULL and is assigned NULL — surface, don't guess.

    Map-only: one md5 per row, no shuffle, no state.
    """
    if len(splits) < 2:
        raise ValueError("need at least two splits")
    shares = [float(s) for _, s in splits]
    if any(s <= 0 for s in shares) or sum(shares) > 1.0 + 1e-9:
        # fail loud, same posture as the NULL-group rule: a share set
        # summing past 1 silently starves the later splits (an asked-for
        # 10% test split deterministically comes back empty) and a
        # non-positive share is always a typo (r14 review finding)
        raise ValueError(
            f"split fractions must be positive and sum to <= 1, got "
            f"{shares}"
        )
    frac = hash_fraction(
        F.concat_ws("|", F.lit(str(seed)), group_col.cast("string"))
    )
    cum = 0.0
    case = None
    for name, share in splits[:-1]:
        cum += float(share)
        cond = frac < F.lit(cum)
        case = F.when(cond, name) if case is None else case.when(cond, name)
    assigned = case.otherwise(splits[-1][0])
    return df.withColumn(
        split_col,
        F.when(group_col.isNull(), F.lit(None).cast("string")).otherwise(
            assigned
        ),
    )


def token_budget_select(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    score_col: str,
    budget: int,
    score_bands: int = 1000,
) -> DataFrame:
    """Greedy token-budget corpus selection: rank documents by quality
    score (desc, ties by id) and keep the maximal prefix in which every
    document fits FULLY inside ``budget`` total tokens — the "best N
    tokens" curation step that turns a scored corpus into a fixed-size
    training mix.

    Scale shape (100 TB): the global running sum over score order is a
    distributed two-phase prefix sum (the :func:`..packing.
    pack_sequences` kernel shape), never a single-partition window —
    documents bucket into quantized score BANDS (map-only), one narrow
    aggregate gives per-band token totals, the only unpartitioned
    window runs over the ≤ ``score_bands`` band totals, and the
    intra-band cumsum is co-partitioned by band. Bands whose offset
    already exceeds the budget are dropped BEFORE the expensive
    intra-band window — at 100 TB with a 10B-token budget that prunes
    almost the whole corpus from phase 2.

    Rows with NULL score or NULL token count are excluded (they cannot
    be ranked). Scores are assumed bounded (quality scores in [0, 1];
    any bounded range works — bands only need monotonicity).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    b = (
        df.select(
            F.col(id_col),
            F.col(tokens_col).cast("long").alias("_n"),
            F.col(score_col).cast("double").alias("_s"),
        )
        .where(F.col("_s").isNotNull() & F.col("_n").isNotNull())
        .withColumn(
            "_band", F.floor(F.col("_s") * float(score_bands)).cast("long")
        )
    )
    totals = b.groupBy("_band").agg(F.sum("_n").alias("_tot"))
    w_off = Window.orderBy(F.desc("_band")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        totals.withColumn(
            "_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0))
        )
        # a band that STARTS past the budget cannot contribute a row
        .where(F.col("_off") <= F.lit(int(budget)))
        .select("_band", "_off")
    )
    w_cum = (
        Window.partitionBy("_band")
        .orderBy(F.desc("_s"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        b.join(F.broadcast(offs), "_band")
        .withColumn(
            "_start",
            F.col("_off") + F.coalesce(F.sum("_n").over(w_cum), F.lit(0)),
        )
        .where(F.col("_start") + F.col("_n") <= F.lit(int(budget)))
        .select(
            F.col(id_col),
            F.col("_s").alias(score_col),
            F.col("_n").alias("n_tokens"),
            (F.col("_start") + F.col("_n")).alias("cum_tokens"),
        )
    )
