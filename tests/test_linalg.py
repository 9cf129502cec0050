"""Quantized Gram matrix + power iteration (operators/linalg.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dogsheep_beta_spark.operators.linalg import quantized_gram, top_eigenvector


def _vec_df(spark, rows, dim):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rows)],
        f"vec_id long, embedding array<float>",
    )


def test_gram_matches_numpy_exactly(spark):
    rng = np.random.RandomState(7)
    x = rng.randn(40, 8).astype(np.float32)
    df = _vec_df(spark, x, 8)
    got = {(r.i, r.j): r.gram for r in quantized_gram(df, "embedding", 8).collect()}
    q = np.floor(x.astype(np.float64) * 1000 + 0.5).astype(np.int64)
    want = q.T @ q
    assert len(got) == 8 * 9 // 2  # upper triangle only
    for (i, j), g in got.items():
        assert i <= j
        assert g == want[i - 1, j - 1]


def test_gram_partitioning_invariant(spark):
    rng = np.random.RandomState(11)
    x = rng.randn(64, 4).astype(np.float32)
    df = _vec_df(spark, x, 4)
    a = quantized_gram(df.repartition(1), "embedding", 4).collect()
    b = quantized_gram(df.repartition(7), "embedding", 4).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_gram_skips_null_and_wrong_dim(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, None),
            (3, [1.0, 2.0, 3.0]),  # wrong dim
            (4, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    got = {(r.i, r.j): r.gram for r in quantized_gram(df, "embedding", 2).collect()}
    # only rows 1 and 4 count: q = [[1000,0],[0,1000]]
    assert got == {(1, 1): 1000000, (1, 2): 0, (2, 2): 1000000}


def test_gram_skips_non_finite_vectors(spark):
    """NaN/Inf components are skipped like NULL/wrong-dim rows (ADVICE
    r6): floor(NaN·scale).astype(int64) is undefined behavior and one
    such row used to silently poison the exact Gram."""
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [float("nan"), 1.0]),
            (3, [float("inf"), 1.0]),
            (4, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    got = {(r.i, r.j): r.gram for r in quantized_gram(df, "embedding", 2).collect()}
    assert got == {(1, 1): 1000000, (1, 2): 0, (2, 2): 1000000}


def test_gram_shuffle_bounded_by_dim(spark):
    """The exchange input is the partial rows (≤ d(d+1)/2 per
    partition), never the embedding rows."""
    rng = np.random.RandomState(3)
    df = _vec_df(spark, rng.randn(500, 4).astype(np.float32), 4).repartition(5)
    plan = (
        quantized_gram(df, "embedding", 4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan
    # the aggregation below the exchange is a partial sum over the
    # MapInPandas output — a second full agg after the shuffle
    assert plan.count("HashAggregate") >= 2


def test_top_eigenvector_known_matrix(spark):
    # diag(9, 4, 1) Gram → dominant eigenvector e1 with positive sign
    rows = [
        {"i": 1, "j": 1, "gram": 9},
        {"i": 2, "j": 2, "gram": 4},
        {"i": 3, "j": 3, "gram": 1},
        {"i": 1, "j": 2, "gram": 0},
        {"i": 1, "j": 3, "gram": 0},
        {"i": 2, "j": 3, "gram": 0},
    ]
    v = top_eigenvector(rows, 3)
    assert v[0] == pytest.approx(1.0, abs=1e-9)
    assert v[1] == pytest.approx(0.0, abs=1e-9)
    assert v[2] == pytest.approx(0.0, abs=1e-9)
