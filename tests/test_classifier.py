"""Trainable quality probe (operators/classifier.py) — hashed-feature
linear classifier fitted by integer-exact GD supersteps."""

import pytest
from pyspark.sql import functions as F

from dogsheep_beta_spark.operators.classifier import (
    MICRO,
    MILLI,
    hashed_features,
    margins_q,
    score_corpus_q,
    train_linear_probe,
)


@pytest.fixture(scope="module")
def toy(spark):
    """Separable corpus: label == doc contains the word 'zebra'."""
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, f"zebra stripes run fast item{i}", 1))
        else:
            rows.append((i, f"plain ordinary words here item{i}", 0))
    rows.append((99, "", 0))  # token-less doc
    df = spark.createDataFrame(rows, "id long, text string, y int")
    feat = hashed_features(df, "id", "text", dim=32).persist()
    labels = df.select("id", "y").persist()
    feat.count(), labels.count()
    return df, feat, labels


def test_probe_learns_separable_labels(spark, toy):
    _, feat, labels = toy
    w = train_linear_probe(feat, labels, dim=32, iters=8, eta=1024)
    sc = score_corpus_q(feat, w)
    j = labels.join(sc, "id", "left").select(
        "y", F.coalesce("score_q", F.lit(MICRO // 2)).alias("s")
    )
    agree = j.where(
        (F.col("s") >= MICRO // 2).cast("int") == F.col("y")
    ).count()
    n = labels.count()
    # a linearly separable token must be essentially solved; the only
    # tolerated misses are hash-collision collateral + the featureless
    # doc pinned at exactly 0.5
    assert agree >= n - 3, (agree, n)


def test_probe_training_is_deterministic(spark, toy):
    _, feat, labels = toy
    a = train_linear_probe(feat, labels, dim=32, iters=4, eta=1024)
    b = train_linear_probe(feat, labels, dim=32, iters=4, eta=1024)
    assert a == b
    assert any(x != 0 for x in a)


def test_features_shape_and_aux_buckets(spark, toy):
    df, feat, _ = toy
    rows = feat.collect()
    # word buckets stay under dim; aux buckets exactly dim..dim+4
    assert {r["bucket"] for r in rows if r["bucket"] >= 32} == {
        32, 33, 34, 35, 36
    }
    # bias feature is exactly 1.0 (milli) for every featured doc
    bias = [r["x_q"] for r in rows if r["bucket"] == 32]
    assert bias and all(x == MILLI for x in bias)
    # token-less doc contributes NO rows (featureless contract)
    assert not [r for r in rows if r["id"] == 99]
    # per-doc word TFs sum to ~1000 (rounding jitter only)
    sums = {}
    for r in rows:
        if r["bucket"] < 32:
            sums[r["id"]] = sums.get(r["id"], 0) + r["x_q"]
    assert all(abs(v - MILLI) <= 5 for v in sums.values()), sums


def test_margins_are_join_free_and_exact(spark, toy):
    # plan claim on a plain feature table (the fixture's lineage would
    # show the feature-CONSTRUCTION joins): the weight lookup is a
    # literal-array element_at — no join node anywhere
    plain = spark.createDataFrame(
        [(1, 0, 500), (1, 32, 1000), (2, 32, 1000)],
        "id long, bucket int, x_q long",
    )
    w = [0] * 37
    w[32] = 250  # bias only: margin = 1000 * 250 = 250000 micro
    m = margins_q(plain, w)
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # literal-array lookup, no weight join
    vals = {r["id"]: r["margin_q"] for r in m.collect()}
    assert set(vals.values()) == {250000}
    # and on the real fixture the values hold too
    _, feat, _ = toy
    real = {r["id"]: r["margin_q"] for r in margins_q(feat, w).collect()}
    assert set(real.values()) == {250000}


def test_default_dim_pairing_trains_aux_slots(spark, toy):
    """ADVICE r7 (medium): hashed_features(dim=D) + train_linear_probe
    (dim=D) — the obvious pairing — must yield a weight vector covering
    the aux buckets D..D+4, with the bias slot actually trained (it used
    to silently look up NULL weights for all five aux features)."""
    from dogsheep_beta_spark.operators.classifier import N_AUX, total_dim

    _, feat, labels = toy
    w = train_linear_probe(feat, labels, dim=32, iters=2, eta=1024)
    assert len(w) == total_dim(32) == 32 + N_AUX
    assert w[32] != 0  # the bias slot received gradient


def test_margins_raise_loudly_on_short_weight_vector(spark, toy):
    """A weight vector shorter than total_dim(hash_dim) must raise, not
    silently NULL the aux features' contribution."""
    from py4j.protocol import Py4JJavaError

    _, feat, _ = toy
    with pytest.raises(Exception) as exc:
        margins_q(feat, [0] * 32).collect()
    assert "bucket out of range" in str(exc.value) or isinstance(
        exc.value, Py4JJavaError
    )


def test_scores_monotone_in_margin(spark):
    from dogsheep_beta_spark.operators.classifier import _sigmoid_q_py

    pts = [-5 * MICRO, -MICRO, 0, MICRO // 2, MICRO, 5 * MICRO]
    ss = [_sigmoid_q_py(p) for p in pts]
    assert ss == sorted(ss)
    assert ss[2] == MICRO // 2  # s(0) = 0.5 exactly
    assert 0 < ss[0] and ss[-1] < MICRO  # saturating, never clipping
