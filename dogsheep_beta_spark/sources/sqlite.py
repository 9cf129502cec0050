"""Native SQLite source ingestion (SURVEY.md §2 A1 — fidelity path).

The reference opens real dogsheep ``.db`` files and ATTACHes them so
rule SQL can read any source table (reference utils.py:36-40,
cli.py:27-32).  Round 1 registered Parquet views only; this module
closes the gap: a ``.db`` file becomes an ordinary DataFrame and a
temp view, so the SAME rule SQL runs against either storage.

Spark-first shape: the classic partitioned-JDBC read, re-expressed
without a JDBC driver jar.  The driver does two tiny metadata queries
(PRAGMA table_info + rowid bounds); the data itself is read inside
``mapInPandas`` tasks, each opening the file READ-ONLY and scanning
only its rowid slice — the exact split strategy of
``spark.read.jdbc(partitionColumn="rowid", lower, upper, numPartitions)``.
No row ever passes through the driver.

Scale notes (100 TB): one SQLite file lives on one filesystem, so the
parallelism story is (a) a dogsheep deployment has MANY dbs (one per
service) — read them concurrently, one range-partitioned scan each —
and (b) within a db, rowid ranges split a big table across executors
reading through a shared mount.  Everything downstream (conform,
upsert, FTS build) is storage-agnostic DataFrame code.
"""

from __future__ import annotations

import sqlite3

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _connect_ro(db_path: str) -> sqlite3.Connection:
    """Read-only open: ingestion must never create or lock a source db."""
    return sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)


def _affinity(decl: str) -> T.DataType:
    """SQLite's published type-affinity rules (column declared type →
    storage class), mapped onto Spark types.  Order matters: INT before
    the CHAR/CLOB/TEXT group, exactly as the affinity algorithm does."""
    d = (decl or "").upper()
    if "INT" in d:
        return T.LongType()
    if "CHAR" in d or "CLOB" in d or "TEXT" in d:
        return T.StringType()
    if "BLOB" in d or d == "":
        return T.BinaryType()
    if "REAL" in d or "FLOA" in d or "DOUB" in d:
        return T.DoubleType()
    return T.DoubleType()  # NUMERIC affinity


def _q(ident: str) -> str:
    """Double-quoted SQL identifier with embedded quotes doubled — a
    legally-named table like we"ird must not break generated SQL."""
    return '"' + ident.replace('"', '""') + '"'


def sqlite_tables(db_path: str) -> list[str]:
    """User tables in the db (reference utils.py iterates the same set)."""
    with _connect_ro(db_path) as con:
        rows = con.execute(
            "SELECT name FROM sqlite_master WHERE type = 'table' "
            "AND name NOT LIKE 'sqlite_%' ORDER BY name"
        ).fetchall()
    return [r[0] for r in rows]


def sqlite_spark_schema(db_path: str, table: str) -> T.StructType:
    """Spark schema for one table via PRAGMA table_info (footer-read
    analog: metadata only, no data scan)."""
    with _connect_ro(db_path) as con:
        info = con.execute(f'PRAGMA table_info({_q(table)})').fetchall()
    if not info:
        raise ValueError(f"no such sqlite table: {table!r}")
    # cid, name, decl_type, notnull, default, pk
    return T.StructType(
        [T.StructField(r[1], _affinity(r[2]), nullable=not r[3]) for r in info]
    )


def _rowid_bounds(db_path: str, table: str) -> tuple[int, int, int] | None:
    """(min_rowid, max_rowid, count), or None for WITHOUT ROWID tables
    (those fall back to a single-partition full scan)."""
    with _connect_ro(db_path) as con:
        try:
            lo, hi, n = con.execute(
                f'SELECT min(rowid), max(rowid), count(*) FROM {_q(table)}'
            ).fetchone()
        except sqlite3.OperationalError:
            return None
    if lo is None:
        return (0, -1, 0)
    return (int(lo), int(hi), int(n))


def _coerce(pdf: pd.DataFrame, schema: T.StructType) -> pd.DataFrame:
    """Arrow-safe dtypes: SQLite NULLs turn integer columns into float64
    in pandas — nullable Int64 keeps them longs through the Arrow
    transfer instead of silently rewriting values as doubles."""
    for f in schema.fields:
        if isinstance(f.dataType, T.LongType):
            pdf[f.name] = pdf[f.name].astype("Int64")
    return pdf


def read_sqlite_table(
    spark: SparkSession,
    db_path: str,
    table: str,
    num_partitions: int = 0,
    rows_per_partition: int = 100_000,
) -> DataFrame:
    """One SQLite table as a range-partitioned DataFrame.

    ``num_partitions`` = 0 sizes the split from the row count
    (``rows_per_partition`` per task), capped by the session's default
    parallelism — small tables stay single-task, big tables fan out.
    The range seed is ``spark.range`` (a generated relation: no
    driver-side collection, unlike ``createDataFrame``).
    """
    schema = sqlite_spark_schema(db_path, table)
    cols = ", ".join(_q(f.name) for f in schema.fields)
    bounds = _rowid_bounds(db_path, table)

    if bounds is None or bounds[2] == 0:
        if bounds is None:  # WITHOUT ROWID: unsplittable, one full scan
            def scan_all(batches):
                con = _connect_ro(db_path)
                try:
                    for _ in batches:
                        # chunked: bounded frames through the Arrow
                        # iterator, never the whole table in one pandas
                        # DataFrame (a multi-GB table would OOM the task)
                        for chunk in pd.read_sql_query(
                            f'SELECT {cols} FROM {_q(table)}',
                            con,
                            chunksize=50_000,
                        ):
                            yield _coerce(chunk, schema)
                finally:
                    con.close()

            return spark.range(1).mapInPandas(scan_all, schema)
        return spark.createDataFrame([], schema)

    lo, hi, n = bounds
    if num_partitions <= 0:
        num_partitions = max(1, min(
            spark.sparkContext.defaultParallelism,
            (n + rows_per_partition - 1) // rows_per_partition,
        ))
    span = hi - lo + 1
    step = (span + num_partitions - 1) // num_partitions

    def read_ranges(batches):
        con = _connect_ro(db_path)
        try:
            for pdf in batches:
                for i in pdf["id"]:
                    a = lo + int(i) * step
                    b = min(hi, a + step - 1)
                    if a > hi:
                        continue
                    out = pd.read_sql_query(
                        f"SELECT {cols} FROM {_q(table)} "
                        f"WHERE rowid BETWEEN ? AND ?",
                        con,
                        params=(a, b),
                    )
                    if len(out):
                        yield _coerce(out, schema)
        finally:
            con.close()

    # exactly one range id per task, with NO shuffle: range(n) with
    # numPartitions=n places id i in partition i by construction —
    # hash-repartitioning the seed left some tasks idle and serialized
    # several rowid slices through one task.
    seed = spark.range(0, num_partitions, 1, numPartitions=num_partitions)
    return seed.mapInPandas(read_ranges, schema)


def register_sqlite_db(
    spark: SparkSession,
    db_path: str,
    tables: list[str] | None = None,
    prefix: str = "",
    num_partitions: int = 0,
) -> dict[str, DataFrame]:
    """Register every (or the named) table of a ``.db`` as a temp view —
    the ATTACH analog: after this, rule SQL reads sqlite sources and
    parquet sources identically."""
    out = {}
    for t in tables if tables is not None else sqlite_tables(db_path):
        df = read_sqlite_table(spark, db_path, t, num_partitions)
        df.createOrReplaceTempView(f"{prefix}{t}")
        out[f"{prefix}{t}"] = df
    return out


def write_sqlite_table(
    df: DataFrame, db_path: str, table: str, batch_size: int = 1000
) -> int:
    """Driver-side fixture writer: materialize a (small) DataFrame into
    a SQLite table — the test/bench harness's way to manufacture real
    ``.db`` sources from the parquet testdata.  NOT a scale path (the
    engine's sinks are Parquet); kept here so tests and the declared
    ingestion query exercise genuine sqlite files end-to-end."""
    pdf = df.toPandas()
    cols = list(pdf.columns)
    # declarations come from the SPARK schema, not pandas dtypes: a
    # nullable long column arrives as float64 after toPandas, which a
    # dtype-based mapping would declare REAL (storing 1 as 1.0 and
    # breaking the lossless round-trip); nullable Int64 frames would
    # land in TEXT.  The integer columns' values are re-coerced below.
    spark_types = {f.name: f.dataType for f in df.schema.fields}

    def decl(name: str) -> str:
        t = spark_types.get(name)
        if isinstance(t, (T.LongType, T.IntegerType, T.ShortType,
                          T.ByteType, T.BooleanType)):
            return "INTEGER"
        if isinstance(t, (T.DoubleType, T.FloatType)):
            return "REAL"
        return "TEXT"

    for c in cols:
        if decl(c) == "INTEGER":
            pdf[c] = pdf[c].astype("Int64")  # 1.0 → 1, NaN → NA

    con = sqlite3.connect(db_path)
    try:
        con.execute(f'DROP TABLE IF EXISTS {_q(table)}')
        spec = ", ".join(f"{_q(c)} {decl(c)}" for c in cols)
        con.execute(f'CREATE TABLE {_q(table)} ({spec})')
        ph = ", ".join("?" for _ in cols)
        rows = [
            tuple(
                None if pd.isna(v) else (int(v) if isinstance(v, pd.Int64Dtype().type) else v)
                for v in r
            )
            for r in pdf.itertuples(index=False, name=None)
        ]
        for i in range(0, len(rows), batch_size):
            con.executemany(
                f'INSERT INTO {_q(table)} VALUES ({ph})', rows[i : i + batch_size]
            )
        con.commit()
    finally:
        con.close()
    return len(pdf)


__all__ = [
    "read_sqlite_table",
    "register_sqlite_db",
    "sqlite_spark_schema",
    "sqlite_tables",
    "write_sqlite_table",
]
