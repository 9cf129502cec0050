"""Mergeable cardinality and frequency sketches (KMV, Count-Min).

At 100 TB you do not count distinct users by shuffling every value
into one exact hash aggregate, and you do not track a hot vocabulary
by carrying the full (term, count) stream around: you keep a
BOUNDED, MERGEABLE summary per partition and combine summaries.  The
two public workhorses:

- **KMV / K-Minimum Values** (Bar-Yossef et al. 2002, "Counting
  distinct elements in a data stream"): keep the k smallest distinct
  hash values; if the k-th smallest is h_(k) over a hash space of
  size S, the distinct count is ≈ (k-1) * S / h_(k).  The synopsis
  is k longs, union-mergeable (union → distinct → min-k), with
  relative error ~1/sqrt(k-2).
- **Count-Min** (Cormode & Muthukrishnan 2005): depth×width counters;
  each item increments one counter per row (independent hash per
  row); the frequency estimate is the MIN over its depth counters —
  always an overestimate, off by at most εN with width=⌈e/ε⌉ at
  confidence 1-δ for depth=⌈ln 1/δ⌉.  The sketch is a tiny
  fixed-size table, addition-mergeable.

Why these are the right Spark shapes:

- ``kmv_sketch`` is distinct → sort-limit.  The partial
  HashAggregate dedups map-side, so the exchange carries each
  partition's DISTINCT hashes once, and TakeOrderedAndProject keeps
  only k rows driver-side.  No full-cardinality state anywhere.
- ``cms_build`` is one map-side projection (depth bucket ids per
  row, inline array + explode) into a partial-aggregated groupBy
  whose key space is ≤ depth*width — the shuffle carries at most
  depth*width rows PER PARTITION no matter how many input rows.

Determinism contract: all hashing is the engine-standard
md5-hex → integer pattern (operators/sampling.py), so a DuckDB
oracle reproduces every bucket, every k-th hash, and every estimate
bit-for-bit — ``('0x' || substr(md5(x),1,15))::BIGINT`` on the
oracle side equals ``conv(substr(md5(x),1,15),16,10)`` here.  15 hex
chars = 60 bits: exact in BIGINT/long arithmetic in both engines,
and the (k-1)*2^60 numerator is an exact double (small mantissa ×
power of two), so the final division is the same IEEE-754 operation
on both sides.

The reference (dogsheep-beta) has no approximate aggregates — its
counts are exact SQLite COUNT(*) (reference/dogsheep_beta/utils.py
search_sql count path); this module is part of the engine's
large-scale extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash space size for the 60-bit (15 hex char) md5 prefix
KMV_SPACE = float(2**60)


def hash60(col: Column, salt: str = "") -> Column:
    """Uniform 60-bit hash of ``col`` as a long — the md5-parity
    pattern (sampling.py:hash_bucket, 15 hex chars so long arithmetic
    stays exact in every engine).  NULL in → NULL out."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def _kmv_est_expr(k_filled, kth_hash, k: int):
    """The KMV estimator as a Column: exact below k, else
    (k-1)·2^60/h₍ₖ₎ — ONE definition shared by the global, per-group,
    and overlap estimators so they can never drift."""
    return F.when(k_filled < k, k_filled.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(KMV_SPACE) / kth_hash.cast("double")
    )


def kmv_sketch(df: DataFrame, col: str, k: int = 256, salt: str = "") -> DataFrame:
    """The KMV synopsis: the ``k`` smallest DISTINCT 60-bit hashes of
    ``col`` (one ``h`` long column, ≤ k rows).

    Plan shape: map-side partial HashAggregate dedups per partition →
    the exchange carries per-partition distincts only →
    TakeOrderedAndProject keeps k rows.  Mergeable: union two
    sketches and re-run ``kmv_sketch`` on the union (see
    ``kmv_merge``)."""
    if k < 2:
        raise ValueError(f"kmv_sketch: k must be >= 2, got {k}")
    h = hash60(F.col(col), salt)
    return (
        df.select(h.alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_merge(sketches: list[DataFrame], k: int) -> DataFrame:
    """Union-merge KMV synopses: union → distinct → min-k.  The merge
    of sketches over disjoint (or overlapping!) partitions of the data
    equals the sketch of the union — the property that makes KMV a
    per-shard summary at fleet scale."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("h").limit(k)


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """1-row distinct-count estimate from a KMV synopsis:

    - fewer than k hashes collected → the sketch IS the distinct set;
      the estimate is the exact count.
    - otherwise D̂ = (k-1) * 2^60 / h_(k)  (h_(k) = max hash kept).

    Returns ``(k_filled, kth_hash, est_distinct)`` where
    ``est_distinct`` is rounded to 4 decimals (both engines round the
    identical double)."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("k_filled"), F.max("h").alias("kth_hash")
    )
    est = _kmv_est_expr(F.col("k_filled"), F.col("kth_hash"), k)
    return agg.select(
        "k_filled", "kth_hash", F.round(est, 4).alias("est_distinct")
    )


def kmv_distinct(
    df: DataFrame, col: str, k: int = 256, salt: str = ""
) -> DataFrame:
    """Convenience: sketch + estimate in one call (1-row DataFrame)."""
    return kmv_estimate(kmv_sketch(df, col, k, salt), k)


def cms_build(
    df: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    salt: str = "",
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch of ``col``'s frequency distribution:
    ``(row, bucket, n)`` with row < depth, bucket < width — at most
    depth*width rows total, regardless of input size.

    Each input row contributes one increment per sketch row; the
    per-row bucket uses an independently salted hash.  The depth
    bucket ids are computed in ONE map-side projection (inline array
    + posexplode), then a partial-aggregated groupBy bounds the
    exchange to ≤ depth*width rows per input partition.  Sketches
    add: union two CMS tables and SUM(n) GROUP BY (row, bucket).

    ``weight_col`` turns the sketch into a weighted-frequency summary
    (e.g. token counts per document rather than row counts)."""
    if width < 2 or depth < 1:
        raise ValueError(
            f"cms_build: need width >= 2 and depth >= 1, got {width}x{depth}"
        )
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    buckets = F.array(
        *[
            (hash60(F.col(col), f"{salt}cms{d}:") % width).cast("int")
            for d in range(depth)
        ]
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(F.posexplode(buckets).alias("row", "bucket"), w.alias("__w"))
        .groupBy("row", "bucket")
        .agg(F.sum("__w").alias("n"))
    )


def cms_lookup(
    cms: DataFrame,
    items: DataFrame,
    col: str,
    width: int,
    depth: int,
    salt: str = "",
) -> DataFrame:
    """Frequency estimates for a candidate set: join each candidate's
    depth (row, bucket) coordinates against the sketch and take the
    MIN over rows — the Count-Min point query (missing buckets read
    as 0, so an unseen item estimates 0).

    The sketch is ≤ depth*width rows → broadcast; the candidate side
    never shuffles.  Output: ``items`` columns + ``cms_est``.

    Join internals use ``__cms_``-prefixed names so candidate tables
    that already carry ``row``/``bucket``/``n`` columns (a counted
    term table is the natural candidate shape) don't collide."""
    for reserved in (
        "__cms_row", "__cms_bucket", "__cms_n", "__cms_rid", "cms_est"
    ):
        if reserved in items.columns:
            raise ValueError(
                f"cms_lookup: items may not contain a column named "
                f"{reserved!r}"
            )
    buckets = F.array(
        *[
            (hash60(F.col(col), f"{salt}cms{d}:") % width).cast("int")
            for d in range(depth)
        ]
    )
    # per-ROW surrogate key through the probe/groupBy: grouping by the
    # item columns alone collapsed duplicate candidate rows to one
    # output row, silently losing multiplicity for non-distinct item
    # tables (ADVICE r6) — the id preserves exactly one output row per
    # input row and is dropped on the way out
    probes = items.withColumn(
        "__cms_rid", F.monotonically_increasing_id()
    ).select(
        "*", F.posexplode(buckets).alias("__cms_row", "__cms_bucket")
    )
    cms_r = cms.select(
        F.col("row").alias("__cms_row"),
        F.col("bucket").alias("__cms_bucket"),
        F.col("n").alias("__cms_n"),
    )
    return (
        probes.join(F.broadcast(cms_r), ["__cms_row", "__cms_bucket"], "left")
        .groupBy("__cms_rid", *items.columns)
        .agg(
            F.min(F.coalesce(F.col("__cms_n"), F.lit(0))).alias("cms_est")
        )
        .drop("__cms_rid")
    )


def kmv_distinct_by(
    df: DataFrame,
    group_col: str,
    col: str,
    k: int = 128,
    salt: str = "",
) -> DataFrame:
    """Per-group distinct-count estimates — "distinct users per
    day/segment" at corpus scale, one bounded synopsis per group.

    Plan: dedup (group, hash) with a map-side partial aggregate, then
    rank hashes inside each group and keep k — Spark's
    WindowGroupLimit applies the rank filter per partition BEFORE the
    window exchange, so the shuffle carries at most k candidates per
    group per partition, never the full per-group distinct set.  The
    estimator is applied per group exactly as in ``kmv_estimate``.

    Returns (group_col, k_filled, kth_hash, est_distinct), one row
    per group (groups whose column is all-NULL produce no row)."""
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"kmv_distinct_by: k must be >= 2, got {k}")
    h = hash60(F.col(col), salt)
    w = Window.partitionBy(group_col).orderBy("h")
    ranked = (
        df.select(F.col(group_col), h.alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
    )
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("k_filled"), F.max("h").alias("kth_hash")
    )
    est = _kmv_est_expr(F.col("k_filled"), F.col("kth_hash"), k)
    return agg.select(
        group_col, "k_filled", "kth_hash", F.round(est, 4).alias("est_distinct")
    )


def kmv_overlap(sketch_a: DataFrame, sketch_b: DataFrame, k: int) -> DataFrame:
    """Distinct-set OVERLAP estimates from two KMV synopses (Beyer et
    al. 2007, "On synopses for distinct value estimation under
    multiset operations"): how many distinct keys two segments share,
    without ever joining the raw sets.

    L = the k smallest hashes of the synopsis UNION is itself the KMV
    synopsis of A ∪ B; the fraction of L present in BOTH input
    sketches estimates the Jaccard similarity, and Ĵ · |A ∪ B|̂
    estimates the intersection cardinality.  Everything is exact
    integer membership plus the same IEEE division/multiplication in
    any engine, so the estimates are bit-deterministic.

    Returns one row: (k_used, shared_in_topk, jaccard_est, union_est,
    intersection_est).  k_used < k means the union synopsis was not
    saturated — the estimates are then exact."""
    both = F.broadcast(
        sketch_a.select("h").intersect(sketch_b.select("h"))
        .withColumn("__both", F.lit(1))
    )
    union_sketch = kmv_merge([sketch_a, sketch_b], k)
    marked = union_sketch.join(both, "h", "left")
    agg = marked.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("kth_hash"),
        F.sum(F.coalesce(F.col("__both"), F.lit(0))).alias("shared_in_topk"),
    )
    union_est = F.round(
        _kmv_est_expr(F.col("k_used"), F.col("kth_hash"), k), 4
    )
    jac = F.round(
        F.col("shared_in_topk").cast("double") / F.col("k_used").cast("double"),
        6,
    )
    return agg.select(
        "k_used",
        "shared_in_topk",
        jac.alias("jaccard_est"),
        union_est.alias("union_est"),
        F.round(
            (
                F.col("shared_in_topk").cast("double")
                / F.col("k_used").cast("double")
            )
            * union_est,
            4,
        ).alias("intersection_est"),
    )
