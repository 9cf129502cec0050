"""SQL-callable engine functions: each SQL UDF body must agree with
the tested Python/column implementation it mirrors, and rule SQL must
be able to call them (the datasette escape_fts-in-SQL analog)."""

from datetime import datetime

from pyspark.sql import functions as F

from dogsheep_beta_spark.functions.sql_udfs import register_sql_functions


def _one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0]["v"]


def test_tokenize_and_count_parity(spark):
    from dogsheep_beta_spark.functions.tokenizer import tokenize_py

    register_sql_functions(spark)
    cases = [
        "Hello, World 42!",
        "  leading -- trailing  ",
        "'quoted' and-hyphened_under",
        "",
        None,
        "ALLCAPS mixedCase 0x1f",
    ]
    for s in cases:
        lit = "NULL" if s is None else "'" + s.replace("'", "''") + "'"
        assert _one(spark, f"dbs_tokenize({lit})") == tokenize_py(s), s
        assert _one(spark, f"dbs_token_count({lit})") == len(
            tokenize_py(s)
        ), s


def test_escape_fts_roundtrips_through_the_parser(spark):
    """The SQL escape must produce a string the MATCH parser reads as
    EXACTLY the engine's AST-level escape fallback — quote-every-token,
    operators disabled."""
    from dogsheep_beta_spark.functions.tokenizer import analyze_py
    from dogsheep_beta_spark.plans.match import And, escape_match, parse_match

    register_sql_functions(spark)
    analyze = lambda s: analyze_py(s, "portable", False)  # noqa: E731

    def norm(node):
        return node if isinstance(node, And) else And([node])

    for q in (
        "#dogfest",
        "github-to-sqlite",
        'say "hi" NOT really',
        "AND",
        'don"t stop',
        '-- "" !!',
        "foo bar",  # UNICODE whitespace: two phrases, not one
        "a\x1cb",  # python str.split() separators beyond \s
    ):
        lit = "'" + q.replace("'", "''") + "'"
        escaped = _one(spark, f"dbs_escape_fts({lit})")
        if escaped == "":
            # nothing tokenizable: both forms agree on "no query"
            # (the engine then takes the blank-q normalization path).
            assert escape_match(q, analyze) == And([]), q
            continue
        assert norm(parse_match(escaped, analyze)) == escape_match(
            q, analyze
        ), (q, escaped)


def test_intcomma_hash_bucket_time_bucket_parity(spark):
    from dogsheep_beta_spark.operators.sampling import hash_bucket
    from dogsheep_beta_spark.operators.temporal import time_bucket
    from dogsheep_beta_spark.presentation import intcomma

    register_sql_functions(spark)
    for n in (0, 999, 1000, 1234567, 98765432100):
        assert _one(spark, f"dbs_intcomma({n})") == intcomma(n)

    ids = spark.createDataFrame(
        [(str(i),) for i in range(200)], "id string"
    )
    got = ids.selectExpr("id", "dbs_hash_bucket(id, 100) AS b").collect()
    want = {
        r["id"]: r["b"]
        for r in ids.select(
            "id", hash_bucket("id", 100).alias("b")
        ).collect()
    }
    assert all(r["b"] == want[r["id"]] for r in got)

    ts = spark.createDataFrame(
        [
            (datetime(2024, 3, 1, 13, 59, 59),),
            (datetime(1969, 12, 31, 23, 0, 1),),  # negative epoch floors
        ],
        "t timestamp",
    )
    got = ts.selectExpr("dbs_time_bucket(t, 3600) AS b").collect()
    want = ts.select(time_bucket(F.col("t"), 3600).alias("b")).collect()
    assert [r["b"] for r in got] == [r["b"] for r in want]


def test_rule_sql_can_call_engine_functions(spark):
    """A config rule's extraction SQL uses the registered functions —
    the end-to-end reason these exist."""
    register_sql_functions(spark)
    spark.createDataFrame(
        [(1, "Dogs are GREAT, really great"), (2, None)],
        "id long, body string",
    ).createOrReplaceTempView("posts")
    out = spark.sql(
        """
        SELECT id AS key, dbs_token_count(body) AS n_tok,
               dbs_hash_bucket(CAST(id AS STRING), 10) AS split_bucket,
               dbs_escape_fts(body) AS safe_q
        FROM posts ORDER BY id
        """
    ).collect()
    assert out[0]["n_tok"] == 5
    assert out[0]["safe_q"].startswith('"Dogs"')
    assert out[1]["n_tok"] == 0 and out[1]["safe_q"] == ""
    assert 0 <= out[0]["split_bucket"] < 10


def test_hash_bucket_null_id_is_null(spark):
    """NULL id → NULL bucket, matching sampling.hash_bucket exactly —
    the coalesce-to-'' put NULL-id rows in a concrete bucket the
    engine-side sampler would never pick (round-6 review)."""
    from dogsheep_beta_spark.operators.sampling import hash_bucket

    register_sql_functions(spark)
    df = spark.createDataFrame([(None,), ("x",)], "id string")
    got = df.selectExpr("dbs_hash_bucket(id, 100) AS b").collect()
    ref = df.select(hash_bucket("id", 100).alias("b")).collect()
    assert [r["b"] for r in got] == [r["b"] for r in ref]
    assert got[0]["b"] is None
