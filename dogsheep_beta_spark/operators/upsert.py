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
    # xxhash64 over per-column NULL-coalesced strings: the hash frames
    # each column's bytes (no concat boundary ambiguity) and is a
    # whole-stage-codegen intrinsic (~ns/row — this runs on EVERY index
    # build, not just on ties).  The explicit coalesce matters: both
    # concat_ws AND Spark's hash family silently SKIP NULL inputs, so
    # ('x', NULL) and (NULL, 'x') would otherwise hash identically and
    # the tie would fall back to partition order.  NULL's sentinel
    # collides only with a literal NUL string — documented, accepted.
    tie = F.xxhash64(
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
            for c in df.columns
            if c != seq_col
        ]
    )
    w = Window.partitionBy(*keys).orderBy(F.desc(seq_col), F.desc(tie))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) | null_pk)
        .drop("__rn", seq_col)
    )
