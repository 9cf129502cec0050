"""Corpus snapshot diff (operators/versioning.py)."""

from pyspark.sql import functions as F

from dogsheep_beta_spark.operators.versioning import snapshot_diff


def test_snapshot_diff_four_way(spark):
    old = spark.createDataFrame(
        [
            (1, "alpha"),
            (2, "beta"),
            (3, "gamma"),
            (4, None),       # NULL text, survives unchanged
            (5, None),       # NULL -> text = changed
            (6, "zeta"),     # removed
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "alpha"),        # unchanged
            (2, "beta EDITED"),  # changed
            (3, "gamma"),        # unchanged
            (4, None),           # unchanged (NULL == NULL null-safe)
            (5, "now present"),  # changed
            (7, "new doc"),      # added
        ],
        "doc_id long, text string",
    )
    got = {
        r["id"]: r["status"]
        for r in snapshot_diff(old, new, "doc_id", "text").collect()
    }
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",
        4: "unchanged",
        5: "changed",
        6: "removed",
        7: "added",
    }


def test_snapshot_diff_single_shuffle_of_digests(spark):
    """Scale shape: ONE join (full outer on id) and the text column
    never crosses the exchange — only the 32-char digests do."""
    old = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (
        snapshot_diff(old, new, "doc_id", "text")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Join") == 1
    # the projected join inputs carry digests, not the raw text column
    assert "text" not in plan.split("Join", 1)[0]
