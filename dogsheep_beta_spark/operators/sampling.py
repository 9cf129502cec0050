"""Deterministic sampling and dataset splitting.

Training pipelines never use ``rand()`` for holdout decisions: a
re-run must put every document in the same split, and a grep must be
able to answer "why is this doc in val?".  The public technique is
hash-based assignment — a stable content/id hash mapped to a bucket.
Everything here is a pure codegen column expression (md5 → int →
modulo), so assignment is reproducible across engines, runs, and
cluster sizes, and costs one map-side pass.

- ``hash_bucket``: (0..buckets-1) from md5 of the id column.
- ``split_assign``: train/val/test by bucket thresholds.
- ``stratified_sample``: exactly n rows per stratum, chosen by hash
  order (deterministic "random"): window row_number per stratum over
  the hash — ONE shuffle on the stratum key, and the per-partition
  rank filter (WindowGroupLimit) keeps n rows per stratum before the
  exchange, so the shuffle carries candidates, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(id_col, buckets: int = 100, salt: str = ""):
    """Stable bucket in [0, buckets): first 8 hex chars of
    md5(salt || id) as an int, mod buckets.  8 hex chars = 32 bits —
    plenty of entropy for bucketing, and small enough that ``conv``'s
    long arithmetic is exact in every engine."""
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets
    ).cast("int")


def split_assign(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "",
) -> DataFrame:
    """Adds a ``split`` column: train/val/test by hash bucket — the
    reproducible holdout split.  Bucket thresholds, not rand(): the
    same doc lands in the same split on every run and engine."""
    b = hash_bucket(id_col, 100, salt)
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def stratified_sample(
    df: DataFrame, stratum_col: str, id_col: str, n: int, salt: str = ""
) -> DataFrame:
    """Exactly ``n`` rows per stratum, deterministically: rank rows
    inside each stratum by their hash (+ id tie-break for identical
    hashes) and keep the first n.  Hash order is uniform over the
    stratum, so this is uniform-without-replacement sampling that every
    re-run reproduces."""
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )
