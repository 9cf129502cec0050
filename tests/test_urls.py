"""URL canonicalization (functions/urls.py): semantics + bit-level
DuckDB parity of the SQL twin."""

import duckdb
import pytest
from pyspark.sql import functions as F

from dogsheep_beta_spark.functions.urls import (
    CANONICALIZE_URL_SQL,
    canonicalize_url,
)

CASES = [
    # (input, expected canonical)
    ("HTTP://Example.COM:80/a/?b=2&a=1#frag", "http://example.com/a?a=1&b=2"),
    ("http://example.com/a?a=1&b=2", "http://example.com/a?a=1&b=2"),
    ("https://www.Example.com:443/", "https://example.com/"),
    ("https://example.com", "https://example.com/"),
    ("http://example.com/path/sub/", "http://example.com/path/sub"),
    ("http://example.com/?", "http://example.com/"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),  # non-default port kept
    ("http://example.com/a#b#c", "http://example.com/a"),
    ("ftp://Host/Dir/", "ftp://host/Dir"),  # path case preserved
    ("http://www.www-site.com/x", "http://www-site.com/x"),  # only leading www.
    # cross-scheme default ports are DIFFERENT origins — kept
    ("http://example.com:443/x", "http://example.com:443/x"),
    ("https://example.com:80/x", "https://example.com:80/x"),
    ("ftp://example.com:80/x", "ftp://example.com:80/x"),
    # scheme-less / relative: defragment only, never collapsed
    ("a.html#top", "a.html"),
    ("/dir/page?b=1", "/dir/page?b=1"),
    ("example.com/x", "example.com/x"),
]


def test_canonicalize_semantics(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [
        r.c
        for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [want for _, want in CASES]


def test_relative_urls_never_collapse(spark):
    # regression: these used to all canonicalize to ':///'
    df = spark.createDataFrame(
        [("a.html",), ("b.html",), ("example.com/x",)], "url string"
    )
    got = {
        r.c for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    }
    assert got == {"a.html", "b.html", "example.com/x"}


def test_canonicalize_null_safe(spark):
    df = spark.createDataFrame([(None,)], "url string")
    [r] = df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    assert r.c is None


def test_canonicalize_duckdb_parity(spark):
    urls = [u for u, _ in CASES] + [
        "http://a.b/c?z=1&y=2&x=3",
        "HTTPS://WWW.A.B:443/P/Q/?m=2&m=1#z",
        "weird string without scheme",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r.url: r.c
        for r in df.select(
            "url", canonicalize_url(F.col("url")).alias("c")
        ).collect()
    }
    con = duckdb.connect()
    expr = CANONICALIZE_URL_SQL.format(col="u")
    for u in urls:
        (exp,) = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS u)", [u]
        ).fetchone()
        assert got[u] == exp, (u, got[u], exp)


def test_canonicalize_is_map_only(spark):
    df = spark.createDataFrame([("http://x/y",)], "url string")
    plan = (
        df.select(canonicalize_url(F.col("url")).alias("c"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
