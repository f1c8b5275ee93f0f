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

from pyspark.sql import Column, DataFrame
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
