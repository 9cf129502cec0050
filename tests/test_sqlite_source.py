"""Native SQLite ingestion (A1 fidelity path) — sources/sqlite.py.

The reference reads real dogsheep ``.db`` files (utils.py:36-40); these
tests manufacture genuine sqlite files and check the range-partitioned
mapInPandas read returns exactly what sqlite holds, across types,
NULLs, blobs, partition counts, and the ATTACH-analog registration.
"""

import os
import sqlite3

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dogsheep_beta_spark.sources.sqlite import (
    read_sqlite_table,
    register_sqlite_db,
    sqlite_spark_schema,
    sqlite_tables,
    write_sqlite_table,
)


@pytest.fixture()
def db(tmpdir):
    path = os.path.join(tmpdir, "dogs.db")
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE beta (id INTEGER PRIMARY KEY, name TEXT, "
        "score REAL, payload BLOB, n INT)"
    )
    rows = [
        (1, "cleo", 1.5, b"\x00\x01", 10),
        (2, "pancakes", None, None, None),
        (3, "niko", -2.25, b"xyz", 7),
        (10, "gap-rowid", 0.0, b"", 0),
    ]
    con.executemany("INSERT INTO beta VALUES (?,?,?,?,?)", rows)
    con.execute("CREATE TABLE empty_t (a INTEGER, b TEXT)")
    con.commit()
    con.close()
    return path


def test_tables_and_schema(db):
    assert sqlite_tables(db) == ["beta", "empty_t"]
    s = sqlite_spark_schema(db, "beta")
    assert [f.name for f in s.fields] == ["id", "name", "score", "payload", "n"]
    assert [type(f.dataType) for f in s.fields] == [
        T.LongType, T.StringType, T.DoubleType, T.BinaryType, T.LongType,
    ]
    with pytest.raises(ValueError):
        sqlite_spark_schema(db, "nope")


def test_read_values_nulls_blobs(spark, db):
    got = {r["id"]: r for r in read_sqlite_table(spark, db, "beta").collect()}
    assert set(got) == {1, 2, 3, 10}
    assert got[1]["name"] == "cleo" and got[1]["score"] == 1.5
    assert bytes(got[1]["payload"]) == b"\x00\x01"
    # NULLs survive as nulls (incl. the Int64 coercion path)
    assert got[2]["score"] is None and got[2]["payload"] is None
    assert got[2]["n"] is None
    assert got[3]["n"] == 7


def test_partitioned_read_equals_single(spark, db):
    one = read_sqlite_table(spark, db, "beta", num_partitions=1)
    many = read_sqlite_table(spark, db, "beta", num_partitions=4)
    assert many.rdd.getNumPartitions() == 4
    assert sorted(one.collect()) == sorted(many.collect())
    # more partitions than rowid span: still complete, no dupes
    over = read_sqlite_table(spark, db, "beta", num_partitions=32)
    assert sorted(over.collect()) == sorted(one.collect())


def test_empty_table(spark, db):
    df = read_sqlite_table(spark, db, "empty_t")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["a", "b"]


def test_register_is_attach_analog(spark, db):
    views = register_sqlite_db(spark, db, prefix="dogs_")
    assert set(views) == {"dogs_beta", "dogs_empty_t"}
    # rule SQL now reads the sqlite source exactly like a parquet view
    n = spark.sql(
        "SELECT count(*) AS c FROM dogs_beta WHERE score IS NOT NULL"
    ).collect()[0]["c"]
    assert n == 3


def test_without_rowid_fallback(spark, tmpdir):
    path = os.path.join(tmpdir, "wr.db")
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE kv (k TEXT PRIMARY KEY, v INTEGER) WITHOUT ROWID"
    )
    con.executemany("INSERT INTO kv VALUES (?,?)", [("a", 1), ("b", 2)])
    con.commit()
    con.close()
    got = {r["k"]: r["v"] for r in read_sqlite_table(spark, path, "kv").collect()}
    assert got == {"a": 1, "b": 2}


def test_write_then_read_roundtrip(spark, db, tmpdir):
    src = spark.createDataFrame(
        [(1, "x", 0.5), (2, None, None)], "i long, s string, f double"
    )
    path = os.path.join(tmpdir, "rt.db")
    assert write_sqlite_table(src, path, "t") == 2
    back = read_sqlite_table(spark, path, "t")
    assert sorted(back.collect()) == sorted(src.collect())


def test_parquet_to_sqlite_to_index_pipeline(spark, tmpdir):
    """End-to-end A1: parquet testdata → real .db file → registered view
    → aggregation matches the parquet original."""
    from dogsheep_beta_spark.sources.registry import register_testdata

    register_testdata(spark, "/root/testdata/sf0.001", tables=("documents",))
    docs = spark.table("documents")
    path = os.path.join(tmpdir, "docs.db")
    write_sqlite_table(docs, path, "documents")
    register_sqlite_db(spark, path, prefix="sq_", num_partitions=4)
    a = (
        spark.table("sq_documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("c"), F.sum(F.length("text")).alias("tl"))
        .collect()
    )
    b = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("c"), F.sum(F.length("text")).alias("tl"))
        .collect()
    )
    assert sorted(a) == sorted(b)


def test_sqlite_quoted_identifiers(spark, tmp_path):
    """A table/column name containing a double quote must round-trip —
    identifiers are escaped by doubling embedded quotes."""
    import sqlite3

    from dogsheep_beta_spark.sources.sqlite import (
        read_sqlite_table,
        sqlite_tables,
    )

    db = str(tmp_path / "weird.db")
    con = sqlite3.connect(db)
    con.execute('CREATE TABLE "we""ird" ("a""b" INTEGER, t TEXT)')
    con.execute('INSERT INTO "we""ird" VALUES (1, \'x\'), (2, \'y\')')
    con.commit()
    con.close()
    assert 'we"ird' in sqlite_tables(db)
    got = read_sqlite_table(spark, db, 'we"ird').collect()
    assert sorted((r['a"b'], r["t"]) for r in got) == [(1, "x"), (2, "y")]


def test_sqlite_write_nullable_long_roundtrip(spark, tmp_path):
    """A long column containing a NULL must come back as INTEGER longs,
    not REAL doubles (toPandas turns nullable longs into float64)."""
    import sqlite3

    from dogsheep_beta_spark.sources.sqlite import (
        read_sqlite_table,
        write_sqlite_table,
    )

    db = str(tmp_path / "nl.db")
    df = spark.createDataFrame([(1, 10), (2, None)], "id long, k long")
    write_sqlite_table(df, db, "t")
    con = sqlite3.connect(db)
    decl = con.execute(
        "SELECT sql FROM sqlite_master WHERE name='t'"
    ).fetchone()[0]
    con.close()
    assert '"k" INTEGER' in decl, decl
    back = read_sqlite_table(spark, db, "t")
    assert dict(back.dtypes)["k"] == "bigint"
    got = {r["id"]: r["k"] for r in back.collect()}
    assert got == {1: 10, 2: None}


def test_sqlite_seed_one_range_per_task(spark, tmp_path):
    """The rowid-range seed places exactly one range id per task (no
    idle tasks, no serialized multi-range tasks)."""
    import sqlite3

    from dogsheep_beta_spark.sources.sqlite import read_sqlite_table

    db = str(tmp_path / "big.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (v INTEGER)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in range(1000)])
    con.commit()
    con.close()
    df = read_sqlite_table(spark, db, "t", num_partitions=4)
    sizes = sorted(
        r["count"]
        for r in df.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    assert len(sizes) == 4 and sizes == [250, 250, 250, 250], sizes
    assert df.count() == 1000
