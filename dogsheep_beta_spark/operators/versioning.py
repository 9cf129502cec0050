"""Corpus snapshot diffing — the dataset-versioning primitive under
incremental recrawls and training-set audits.

A pretraining pipeline re-ingests sources on a cadence; the question a
data audit asks between two snapshots is always the same four-way
split: which documents were ADDED, which were REMOVED, which ids
survived with CHANGED content, which are byte-UNCHANGED.  (Delta/
Iceberg answer this with table history; on plain-parquet snapshots it
is one full-outer hash join — this module.)  The changed/unchanged
verdict compares content HASHES, not bytes, so the 100 TB text column
reduces map-side to one 32-char digest per row before the only
shuffle, and the join carries (id, hash) pairs — never documents.

Downstream uses: re-run expensive per-doc signals (quality, dedup
membership) only for `added ∪ changed`; retention/GC for `removed`;
drift dashboards from the per-source status counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, status) for every id in either snapshot — status ∈
    {'added', 'removed', 'changed', 'unchanged'}.

    One map-side md5 per side, one full-outer equi-join on id (the
    only shuffle, carrying digests).  NULL text hashes to NULL and
    compares via null-safe equality, so NULL → NULL is 'unchanged'
    and NULL → text is 'changed' — same verdicts in the SQL twin."""
    # presence flags ride each side (a NULL-text row is PRESENT with a
    # NULL hash — presence must not be inferred from the hash)
    o = old.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(text_col)).alias("__oh"),
        F.lit(1).alias("__o"),
    )
    n = new.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(text_col)).alias("__nh"),
        F.lit(1).alias("__n"),
    )
    return o.join(n, "id", "full_outer").select(
        "id",
        F.when(F.col("__o").isNull(), F.lit("added"))
        .when(F.col("__n").isNull(), F.lit("removed"))
        .when(F.col("__oh").eqNullSafe(F.col("__nh")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )
