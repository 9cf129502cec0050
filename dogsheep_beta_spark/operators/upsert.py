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
    """Keep, per pk, the row with the greatest ``seq_col`` (REPLACE INTO).

    SQLite parity details (round-6 review):
    - rows with a NULL pk column never conflict (SQLite PRIMARY KEYs
      admit NULLs and treat them as pairwise distinct), so they ALL
      pass through instead of collapsing into one arbitrary survivor;
    - ``seq_col`` ties (one rule emitting duplicate keys) break on a
      content hash, so re-runs and re-partitionings keep the SAME row —
      the reference's "last row in statement order" has no distributed
      analog, but determinism is the contract (SURVEY §7.3 item 4).
    """
    null_pk = None
    for k in keys:
        cond = F.col(k).isNull()
        null_pk = cond if null_pk is None else (null_pk | cond)
    # per-column md5 THEN concat: concat_ws would silently SKIP NULL
    # columns (concat_ws(sep, 'x', NULL) == concat_ws(sep, NULL, 'x')),
    # letting distinct rows hash identically and the tie go back to
    # partition order.  Fixed-width inner hashes leave no boundary
    # ambiguity; NULL gets a sentinel distinct from any real string
    # short of a literal NUL.
    tie = F.md5(
        F.concat(
            *[
                F.md5(F.coalesce(F.col(c).cast("string"), F.lit("\x00")))
                for c in df.columns
                if c != seq_col
            ]
        )
    )
    w = Window.partitionBy(*keys).orderBy(F.desc(seq_col), F.desc(tie))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) | null_pk)
        .drop("__rn", seq_col)
    )
