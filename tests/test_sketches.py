"""KMV distinct-count and Count-Min frequency sketches.

Pins: (1) exact behavior when the sketch is not saturated, (2) the
estimator's error at saturation, (3) the union-merge identity that
makes the synopses shard-combinable, (4) CMS's one-sided error and
point-query semantics, (5) bit-level hash parity with the DuckDB
oracle expression."""

import duckdb
import pytest
from pyspark.sql import functions as F

from dogsheep_beta_spark.operators.sketches import (
    KMV_SPACE,
    cms_build,
    cms_lookup,
    hash60,
    kmv_distinct,
    kmv_merge,
    kmv_sketch,
)


def _ids(spark, lo, hi, col="id"):
    return spark.range(lo, hi).select(F.col("id").alias(col))


def test_kmv_exact_below_k(spark):
    # 40 distinct values, k=64: the sketch holds everything → exact
    df = _ids(spark, 0, 100).select((F.col("id") % 40).alias("v"))
    row = kmv_distinct(df, "v", k=64).collect()[0]
    assert row.k_filled == 40
    assert row.est_distinct == 40.0


def test_kmv_estimate_at_saturation(spark):
    # 5000 distinct, k=128 → rel error ~1/sqrt(126) ≈ 9%; allow 30%
    df = _ids(spark, 0, 5000, "v")
    row = kmv_distinct(df, "v", k=128).collect()[0]
    assert row.k_filled == 128
    assert 0.7 * 5000 <= row.est_distinct <= 1.3 * 5000


def test_kmv_duplicates_do_not_skew(spark):
    # the same 500 values repeated 10x estimate like 500 values once
    once = _ids(spark, 0, 500, "v")
    tenx = _ids(spark, 0, 5000).select((F.col("id") % 500).alias("v"))
    a = kmv_distinct(once, "v", k=64).collect()[0]
    b = kmv_distinct(tenx, "v", k=64).collect()[0]
    assert a == b  # identical sketch → identical estimate


def test_kmv_merge_equals_sketch_of_union(spark):
    k = 32
    left = _ids(spark, 0, 400, "v")
    right = _ids(spark, 200, 700, "v")  # overlapping ranges
    direct = kmv_sketch(left.unionByName(right), "v", k=k)
    merged = kmv_merge([kmv_sketch(left, "v", k=k), kmv_sketch(right, "v", k=k)], k=k)
    assert [r.h for r in direct.collect()] == [r.h for r in merged.collect()]


def test_kmv_null_and_k_validation(spark):
    df = spark.createDataFrame([("a",), (None,), ("b",)], "v string")
    assert kmv_sketch(df, "v", k=8).count() == 2
    with pytest.raises(ValueError):
        kmv_sketch(df, "v", k=1)


def test_cms_overestimates_and_wide_sketch_is_exact(spark):
    # zipf-ish: value v appears (50 - v) times for v in 0..49
    df = _ids(spark, 0, 50).select(
        F.explode(F.sequence(F.lit(1), 50 - F.col("id"))).alias("rep"),
        F.col("id").alias("v"),
    ).select("v")
    exact = {r.v: r.n for r in df.groupBy("v").agg(F.count("*").alias("n")).collect()}
    items = df.select("v").distinct()

    # wide sketch: no collisions plausible at width 4096 for 50 keys
    cms = cms_build(df, "v", width=4096, depth=4)
    got = {r.v: r.cms_est for r in cms_lookup(cms, items, "v", 4096, 4).collect()}
    assert got == exact

    # narrow sketch: estimates never undershoot
    cms2 = cms_build(df, "v", width=8, depth=2)
    got2 = {r.v: r.cms_est for r in cms_lookup(cms2, items, "v", 8, 2).collect()}
    assert all(got2[v] >= exact[v] for v in exact)


def test_cms_unseen_item_reads_zero_on_wide_sketch(spark):
    df = _ids(spark, 0, 20, "v")
    cms = cms_build(df, "v", width=4096, depth=4)
    probe = spark.createDataFrame([(999999,)], "v long")
    [row] = cms_lookup(cms, probe, "v", 4096, 4).collect()
    assert row.cms_est == 0


def test_cms_bounded_size_and_weighted(spark):
    df = _ids(spark, 0, 10_000, "v")
    cms = cms_build(df, "v", width=64, depth=3)
    assert cms.count() <= 64 * 3
    # weighted: each row contributes weight w = v % 5
    wdf = df.select("v", (F.col("v") % 5).alias("w"))
    cmsw = cms_build(wdf, "v", width=4096, depth=4, weight_col="w")
    items = spark.createDataFrame([(7,)], "v long")
    [row] = cms_lookup(cmsw, items, "v", 4096, 4).collect()
    assert row.cms_est == 7 % 5


def test_hash60_duckdb_parity(spark):
    vals = ["", "a", "hello world", "42", "ünïcode"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {
        r.v: r.h
        for r in df.select("v", hash60(F.col("v"), "s:").alias("h")).collect()
    }
    con = duckdb.connect()
    for v in vals:
        (exp,) = con.execute(
            "SELECT CAST(('0x' || substr(md5('s:' || ?), 1, 15)) AS BIGINT)", [v]
        ).fetchone()
        assert got[v] == exp, v
    assert all(0 <= h < KMV_SPACE for h in got.values())


def test_kmv_distinct_by_groups(spark):
    from dogsheep_beta_spark.operators.sketches import kmv_distinct_by

    # group 'small': 10 distinct (< k, exact); 'big': 2000 distinct
    df = _ids(spark, 0, 4000).select(
        F.when(F.col("id") < 2000, "big").otherwise("small").alias("g"),
        F.when(F.col("id") < 2000, F.col("id"))
        .otherwise(F.col("id") % 10 + 10_000)
        .alias("v"),
    )
    rows = {r.g: r for r in kmv_distinct_by(df, "g", "v", k=64).collect()}
    assert rows["small"].k_filled == 10
    assert rows["small"].est_distinct == 10.0
    assert rows["big"].k_filled == 64
    assert 0.6 * 2000 <= rows["big"].est_distinct <= 1.4 * 2000
    # per-group result equals the global sketch restricted to the group
    from dogsheep_beta_spark.operators.sketches import kmv_distinct

    [solo] = kmv_distinct(
        df.where(F.col("g") == "big").select("v"), "v", k=64
    ).collect()
    assert (rows["big"].k_filled, rows["big"].kth_hash,
            rows["big"].est_distinct) == tuple(solo)


def test_kmv_distinct_by_plan_group_limit(spark):
    from dogsheep_beta_spark.operators.sketches import kmv_distinct_by

    df = _ids(spark, 0, 1000).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("v")
    )
    plan = (
        kmv_distinct_by(df, "g", "v", k=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan  # rank filter before the exchange


def test_kmv_overlap_estimates(spark):
    from dogsheep_beta_spark.operators.sketches import kmv_overlap, kmv_sketch

    # A = 0..2999, B = 2000..4999 → |A∪B|=5000, |A∩B|=1000, J=0.2
    a = kmv_sketch(_ids(spark, 0, 3000, "v"), "v", k=128)
    b = kmv_sketch(_ids(spark, 2000, 5000, "v"), "v", k=128)
    [row] = kmv_overlap(a, b, k=128).collect()
    assert row.k_used == 128
    assert 0.10 <= row.jaccard_est <= 0.32
    assert 0.7 * 5000 <= row.union_est <= 1.3 * 5000
    assert 0.5 * 1000 <= row.intersection_est <= 1.7 * 1000


def test_kmv_overlap_exact_below_k(spark):
    from dogsheep_beta_spark.operators.sketches import kmv_overlap, kmv_sketch

    a = kmv_sketch(_ids(spark, 0, 30, "v"), "v", k=256)
    b = kmv_sketch(_ids(spark, 20, 50, "v"), "v", k=256)
    [row] = kmv_overlap(a, b, k=256).collect()
    assert row.k_used == 50  # union not saturated → exact
    assert row.shared_in_topk == 10
    assert row.union_est == 50.0
    assert row.intersection_est == 10.0


def test_kmv_overlap_disjoint_and_identical(spark):
    from dogsheep_beta_spark.operators.sketches import kmv_overlap, kmv_sketch

    a = kmv_sketch(_ids(spark, 0, 1000, "v"), "v", k=64)
    b = kmv_sketch(_ids(spark, 5000, 6000, "v"), "v", k=64)
    [dis] = kmv_overlap(a, b, k=64).collect()
    assert dis.jaccard_est == 0.0 and dis.intersection_est == 0.0
    [ident] = kmv_overlap(a, a, k=64).collect()
    assert ident.jaccard_est == 1.0


def test_cms_lookup_preserves_row_multiplicity(spark):
    """Duplicate candidate rows each get their own estimate row (ADVICE
    r6: the old groupBy(items.columns) silently collapsed them)."""
    from dogsheep_beta_spark.operators.sketches import cms_build, cms_lookup

    df = spark.range(0, 100).select(F.col("id").alias("v"))
    cms = cms_build(df, "v", width=64, depth=3)
    items = spark.createDataFrame([(7,), (7,), (9,)], "v long")
    rows = cms_lookup(cms, items, "v", 64, 3).collect()
    assert len(rows) == 3
    ests = sorted((r["v"], r["cms_est"]) for r in rows)
    assert ests[0] == ests[1]  # both 7-rows present, same estimate
