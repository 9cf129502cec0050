"""Skew mitigation — salting for hot join/agg keys (SURVEY §7.5).

AQE's skew-join split handles most sort-merge skew at runtime, but two
shapes still need explicit salting at 100 TB:

- aggregations whose group key is pathologically hot (one term, one
  type) — AQE cannot split a hash-agg group;
- joins against a *replicable* small-but-not-tiny side where one key
  dominates the probe side.

Both helpers are deterministic: the salt is a stable hash of a
tie-break column, NOT rand(), so results are reproducible and
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(tie_break: Column, n_salts: int) -> Column:
    """Stable salt in [0, n_salts): xxhash of a tie-break column.

    Deterministic (same row → same salt) so repeated runs produce
    identical partitioning — unlike rand()-based salting."""
    return F.pmod(F.xxhash64(tie_break), F.lit(n_salts)).cast("int")


def salted_agg_count(
    df: DataFrame, key_cols: list[str], tie_break: str, n_salts: int = 16
) -> DataFrame:
    """Two-phase count for hot group keys: groupBy(key, salt) partial →
    groupBy(key) final.  The first shuffle spreads a hot key over
    ``n_salts`` reducers; the second combines ``n_salts`` tiny rows.

    (Spark's hash aggregate already does map-side partials; salting
    additionally splits the *reduce side* of a hot key.)"""
    salted = df.withColumn("__salt", salt_column(F.col(tie_break), n_salts))
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.count(F.lit(1)).alias("__partial")
    )
    return partial.groupBy(*key_cols).agg(F.sum("__partial").alias("count"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    tie_break: str | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small
    side ``n_salts`` times, join on (key, salt).

    Use when the small side is too large to broadcast outright but each
    key's rows fit comfortably replicated; a hot key on the big side is
    spread across ``n_salts`` tasks instead of one straggler."""
    tb = tie_break or on
    big_salted = big.withColumn("__salt", salt_column(F.col(tb), n_salts))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    small_rep = small.select("*", salts)
    joined = big_salted.join(small_rep, [on, "__salt"], "inner")
    return joined.drop("__salt")
