"""Declarative data-quality constraint checks (the Deequ /
Great-Expectations staple): a list of constraint specs compiles into
ONE aggregate pass over the table, emitting a long-format report row
per constraint — (check, metric, threshold, passed).

Spark-first shape: every metric is a conditional aggregate (or an
exact ``count_distinct``) in a single ``agg``; a 100 TB table pays one
scan + one single-row (partial-aggregated) reduce for the whole suite,
never a pass per constraint. Referential-integrity checks need a join
by nature — ``subset_of`` compiles to a broadcast/left-anti violation
count and unions its row into the same report.

Metrics are deterministic fractions rounded to 6 dp, so a constraint
suite is oracle-hashable like any other registry query (the
``dq_lineitem_report`` entry) — the engine's own data-quality claims
are themselves correctness-checked.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class _Constraint:
    name: str
    kind: str  # agg | subset
    metric: Column | None = None  # aggregate expr → fraction in [0,1]
    keys: tuple | None = None  # subset_of: (fact_col, dim_df, dim_col)
    threshold: float = 1.0  # passed ⟺ metric >= threshold


def completeness(col: str, threshold: float = 1.0) -> _Constraint:
    """Fraction of rows where ``col`` is non-null."""
    frac = F.count(F.col(col)) / F.greatest(F.count(F.lit(1)), F.lit(1))
    return _Constraint(f"completeness({col})", "agg", frac, None, threshold)


def satisfies(
    name: str, predicate: Column, threshold: float = 1.0
) -> _Constraint:
    """Fraction of rows satisfying an arbitrary boolean expression
    (NULL counts as violation — explicit, not silently skipped)."""
    frac = F.sum(
        F.when(predicate, 1).otherwise(0)
    ) / F.greatest(F.count(F.lit(1)), F.lit(1))
    return _Constraint(f"satisfies({name})", "agg", frac, None, threshold)


def uniqueness(cols: list[str], threshold: float = 1.0) -> _Constraint:
    """distinct(key) / count — 1.0 ⟺ the key is unique. Exact
    ``count_distinct`` (two-phase partial agg), not approximate:
    a uniqueness CLAIM should not rest on a sketch."""
    key = F.struct(*[F.col(c) for c in cols])
    frac = F.count_distinct(key) / F.greatest(F.count(F.lit(1)), F.lit(1))
    return _Constraint(
        f"uniqueness({','.join(cols)})", "agg", frac, None, threshold
    )


def subset_of(
    fact_col: str,
    dim: DataFrame,
    dim_col: str,
    threshold: float = 1.0,
) -> _Constraint:
    """Referential integrity: fraction of fact rows whose key exists in
    the dimension. Compiles to a left-anti violation count (the dim
    side broadcasts when small; at scale it is the standard anti-join
    shuffle on the key, 8-byte rows only)."""
    return _Constraint(
        f"subset_of({fact_col})",
        "subset",
        None,
        (fact_col, dim, dim_col),
        threshold,
    )


def constraint_report(
    df: DataFrame, constraints: list[_Constraint]
) -> DataFrame:
    """Compile the suite: all agg-kind metrics in ONE aggregate over
    one scan; each subset_of adds one anti-join leg; rows union into
    (check, metric, threshold, passed)."""
    agg_cs = [c for c in constraints if c.kind == "agg"]
    legs = []
    if agg_cs:
        one = df.agg(
            *[
                F.round(c.metric, 6).alias(f"m{i}")
                for i, c in enumerate(agg_cs)
            ]
        )
        rows = F.array(
            *[
                F.struct(
                    F.lit(c.name).alias("check"),
                    F.col(f"m{i}").cast("double").alias("metric"),
                    F.lit(c.threshold).cast("double").alias("threshold"),
                )
                for i, c in enumerate(agg_cs)
            ]
        )
        legs.append(
            one.select(F.explode(rows).alias("r")).select("r.*")
        )
    subset_cs = [c for c in constraints if c.kind == "subset"]
    # ONE total-count subtree shared by every referential leg (identical
    # plans → Catalyst's ReuseExchange collapses them)
    total = df.agg(F.count(F.lit(1)).alias("n")) if subset_cs else None
    for c in subset_cs:
        fact_col, dim, dim_col = c.keys
        ok = (
            df.select(F.col(fact_col).alias("k"))
            .join(
                dim.select(F.col(dim_col).alias("k")).distinct(),
                "k",
                "left_semi",
            )
            .agg(F.count(F.lit(1)).alias("n_ok"))
        )
        legs.append(
            ok.crossJoin(F.broadcast(total)).select(
                F.lit(c.name).alias("check"),
                F.round(
                    F.col("n_ok") / F.greatest(F.col("n"), F.lit(1)), 6
                ).alias("metric"),
                F.lit(c.threshold).cast("double").alias("threshold"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.select(
        "check",
        "metric",
        "threshold",
        (F.col("metric") >= F.col("threshold")).alias("passed"),
    )
