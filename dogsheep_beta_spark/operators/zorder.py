"""Z-order clustered layouts — multi-dimensional data skipping.

The 1-D layouts the engine already writes (``sort_by_timestamp`` row
groups, ``partition_by_type`` directories — indexer.py A8/A11, the
reference's covering-index + trigger-maintenance analog at
``dogsheep_beta/utils.py:64-90``) each serve ONE predicate dimension.
A timeline page filters BOTH ways at once (`type = 'tweets' AND date =
…`, reference ``__init__.py:55-108``), and at 100 TB whichever
dimension you didn't sort by reads the whole table.

Z-ordering (Morton order) interleaves the bits of several dimensions
into one sort key, so rows close in ANY dimension land close on disk:
every file's min/max footer stats then bound a small hyper-rectangle
of (type, day) space, and Parquet stats pruning skips most files for
filters on EITHER column — the public Delta/Iceberg ``OPTIMIZE ZORDER
BY`` technique, reimplemented here as a pure column expression.

Spark-first shape: the z-value is a codegen bit-twiddling expression
(no UDF), the clustering is ``repartitionByRange(z)`` (range exchange
= one shuffle, same cost class as the 1-D sort it replaces) +
``sortWithinPartitions(z)``.  Layout work happens once at write time;
readers pay nothing and need no library support — pruning falls out of
ordinary Parquet min/max stats on the ORIGINAL columns.

Dimension encoding (``bits`` per dimension, default 16):

- integral / date-derived dims enter as ``value mod 2^bits`` —
  order-preserving inside a 2^bits window (65 536 days ≈ 179 years),
  which is what range predicates need;
- low-cardinality string dims enter as ``xxhash64 mod 2^bits`` —
  equality predicates only, which is exactly how such columns are
  filtered; all rows of one value still cluster together, so the raw
  column's file stats stay narrow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dim_expr(col: Column, kind: str, bits: int) -> Column:
    """Encoded dimension in [0, 2^bits).  NULL-safe by construction: a
    NULL in ANY dimension would otherwise null the whole interleaved
    key (pmod(null) propagates through every bitwiseOR), collapsing
    every such row into one skewed range partition with no clustering
    on the non-null dims.  NULLs encode as slot 0 — they cluster
    together and the other dimensions keep their spread."""
    m = F.lit(1 << bits)
    if kind == "int":
        return F.coalesce(F.pmod(col.cast("long"), m), F.lit(0))
    if kind == "hash":
        return F.coalesce(F.pmod(F.xxhash64(col), m), F.lit(0))
    if kind == "day":
        # µs timestamp → day number; floor (not cast) so pre-1970 days
        # order correctly, same device as temporal.time_bucket.
        day = F.floor(F.unix_micros(col) / F.lit(86_400_000_000)).cast("long")
        return F.coalesce(F.pmod(day, m), F.lit(0))
    raise ValueError(f"unknown zorder dim kind: {kind}")


def zorder_key(dims: list[tuple[Column, str]], bits: int = 16) -> Column:
    """Morton interleave: bit i of dimension j lands at position
    ``i * n_dims + j`` of the key.  Pure shift/and/or expression tree
    (``2 * bits * n_dims`` ops), entirely inside whole-stage codegen —
    a 100 TB write pays zero Python and zero extra passes for it.

    ``dims``: (column, kind) with kind ``int`` (order-preserving mod),
    ``day`` (µs timestamp → day number), or ``hash`` (equality-only
    string dims)."""
    n = len(dims)
    if n == 0:
        raise ValueError("zorder_key needs at least one dimension")
    if bits * n > 63:
        raise ValueError("bits * n_dims must fit in a signed long")
    encoded = [_dim_expr(c, kind, bits) for c, kind in dims]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, e in enumerate(encoded):
            bit = F.shiftright(e, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    dims: list[tuple[str, str]],
    n_files: int = 32,
    bits: int = 16,
) -> None:
    """Cluster ``df`` in Morton order and write ``n_files`` Parquet
    files: range-exchange on the z-key (one shuffle — the same cost as
    the 1-D ``sort_by_timestamp`` layout this generalizes), sort within
    each output file, drop the key.  File/row-group min/max stats on
    the original columns then bound small (dim₁ × dim₂ …) rectangles,
    and ANY single-dimension filter prunes most files — verified
    footer-by-footer in tests/test_persistence.py.

    ``dims``: (column_name, kind) pairs, kind as in ``zorder_key``.
    """
    z = zorder_key([(F.col(c), kind) for c, kind in dims], bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
