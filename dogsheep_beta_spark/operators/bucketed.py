"""Bucketed at-rest layout — co-located joins with no join-side shuffle.

The 100 TB fact⋈fact problem: a sort-merge join between two large
tables shuffles BOTH sides on the key every time the join runs.  When
the same join recurs (fact tables joined on the same key every day),
the shuffle should be paid once at write time, not per query: write
both tables hash-bucketed by the join key with the same bucket count,
and every subsequent join reads bucket i of each side into the same
task — zero Exchange on either side, only a local sort.

This is the Spark-native analog of the reference's per-source SQLite
files being "pre-partitioned" by database (SURVEY §2 A1): the layout
itself carries the distribution.  Spark's bucketed parquet tables
(``DataFrameWriter.bucketBy`` + ``saveAsTable``) store
``Murmur3Hash(key) % n_buckets`` in file names and the catalog, and the
planner consumes the distribution (``spark.sql.sources.bucketing.enabled``,
on by default).

Scale notes:
- bucket count is a write-time commitment: pick ``n_buckets`` ≈ data /
  target-partition-size at FULL scale (e.g. 100 TB / 256 MB ≈ 400k is
  too many files; in practice 4-32k buckets with multiple files per
  bucket).  Both sides MUST use the same count (or a multiple, with
  ``spark.sql.bucketing.coalesceBucketedTableScan.enabled``).
- one shuffle-free join per layout: a query joining on a DIFFERENT key
  still shuffles; bucketing is for the dominant recurring join key.
- writes repartition by the bucket expression first so each task emits
  one file per bucket it owns, not #tasks × #buckets small files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Write ``df`` as an external parquet table hash-bucketed by ``key``.

    Repartitions by the bucket key first so every bucket's rows are
    written by one task (bounded file count).  ``sort=True`` also sorts
    rows by ``key`` inside each bucket file, which lets the bucketed
    sort-merge join skip or cheapen its local sort.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.repartition(n_buckets, F.col(key))
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys.

    The ``merge`` hint pins sort-merge (a broadcast would also be
    shuffle-free but hides whether the layout is being consumed); with
    matching bucket specs the planner emits NO Exchange on either side
    — bucket i of each table meets in task i.  Callers verify with
    ``assert "Exchange" not in plan`` (tests/test_plans.py).
    """
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, F.col(left_key) == F.col(right_key), how)
