"""J3/A2 — explicit skew handling: salted joins and two-phase aggs.

BASELINE.json:L6/L14 bind "salted keys AND AQE" for head-entity skew at
10^12-document scale. AQE's skew-join split only covers sort-merge join
inputs; a skewed ``groupBy`` or an exploding broadcast side still needs
salting, so both tools exist here and the oracle-checked queries prove
salted results equal their unsalted ANSI-SQL forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys split ``salt`` ways.

    Big side gets a deterministic per-row salt (hash of all columns, NOT
    rand() — reruns must be identical for resume/lineage); the small side
    is replicated xsalt via explode so every (key, salt) bucket finds its
    match. Result == plain ``big.join(small, key)``.
    """
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    cond = (big_s[big_key] == small_s[small_key]) & (
        big_s["_salt"] == small_s["_salt"]
    )
    return big_s.join(small_s, cond, how).drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str | None]],
    salt: int = 8,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys+salt) partial -> groupBy(keys)
    final. ``aggs``: out_name -> (kind, col) with kind in
    {count, sum, sum_long, min, max}. Result == plain groupBy(keys).
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    partial_exprs = []
    final_exprs = []
    for name, (kind, col) in aggs.items():
        p = f"_p_{name}"
        if kind == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(p))
            final_exprs.append(F.sum(p).alias(name))
        elif kind in ("sum", "sum_long"):
            partial_exprs.append(F.sum(col).alias(p))
            agg = F.sum(p)
            if kind == "sum_long":
                agg = agg.cast("long")
            final_exprs.append(agg.alias(name))
        elif kind == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(name))
        elif kind == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(name))
        else:
            raise ValueError(f"unsupported agg kind: {kind}")
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
