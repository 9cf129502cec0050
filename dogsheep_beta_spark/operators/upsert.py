"""Last-writer-wins upsert — the Spark analog of SQLite ``REPLACE INTO``.

Reference: utils.py:49-54 — each rule's ``REPLACE INTO search_index ...``
delete-then-inserts on pk ``(type, key)`` conflict, so the LAST rule to
write a key wins.  Load order is the config iteration order
(utils.py:36-54); we materialize it as an explicit ``load_seq`` literal so
the result is deterministic (SURVEY.md §7.3 item 4, §2 A5).

Scale note (100 TB): this is one hash-partitioned window over the pk —
a single shuffle on (type, key), no sort of the full data beyond each
key group (key groups are tiny: one row per writing rule).  AQE handles
skewed types.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def union_conformed(dfs: list[DataFrame]) -> DataFrame:
    """Heterogeneous UNION ALL of conformed rule outputs (SURVEY §2 G1)."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )


def last_writer_wins(
    df: DataFrame, keys=("type", "key"), seq_col: str = "load_seq"
) -> DataFrame:
    """Keep, per pk, the row with the greatest ``seq_col`` (REPLACE INTO)."""
    w = Window.partitionBy(*keys).orderBy(F.desc(seq_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", seq_col)
    )
