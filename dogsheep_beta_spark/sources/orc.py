"""ORC source/sink (SURVEY.md §2 A1 — format path, sibling of csv.py /
jsonl.py; the fourth lake format beside parquet).

Why ORC earns a module at 100 TB: it is the other splittable columnar
lake format a migrating warehouse actually has on disk (Hive/Trino
estates are predominantly ORC), and Spark's reader is native +
vectorized — predicate pushdown, column pruning, and stripe-level
splits all work exactly as for parquet, so an ORC-resident corpus
needs no conversion pass before this engine's operators run on it.

Contract mirrors the other format modules: explicit schema honored on
read (ORC embeds one, but the caller's schema wins so the SAME rule
SQL runs downstream of every format), DataFrame out, lossless
round-trip pinned by the ``orc_source_ingest`` oracle against the
parquet-resident twin.  Unlike CSV there is no quoting/null-sentinel
caveat — ORC is typed and nullable out-of-band, so NULL vs '' and
embedded newlines are non-events.

Spark-native: both paths are thin wrappers over the built-in
``orc`` DataSource (JVM-side, whole-stage codegen reads); they exist
so format choice is one import, audited in one place, like every
other source."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_orc(df: DataFrame, path: str, num_files: int | None = None) -> None:
    """Write ORC, optionally coalescing to ``num_files`` (testdata
    convenience — real corpora keep natural partitioning; zlib is
    Spark's default ORC codec and every reader understands it)."""
    out = df.coalesce(num_files) if num_files else df
    out.write.mode("overwrite").orc(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC scan; with ``schema`` the caller's column set/order is
    enforced (select-cast, not schema-on-read: ORC files carry their
    own types, so a mismatched cast surfaces as an analysis error
    rather than silent NULL-fill)."""
    df = spark.read.orc(path)
    if schema is not None:
        cols = [
            df[f.name].cast(f.dataType).alias(f.name) for f in schema.fields
        ]
        df = df.select(*cols)
    return df
