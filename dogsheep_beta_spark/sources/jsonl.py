"""Newline-delimited JSON source/sink (SURVEY.md §2 A1 — format path).

The reference ingests whatever a dogsheep tool exported into SQLite;
the exports themselves start life as JSON from service APIs
(reference README.md: twitter-to-sqlite, github-to-sqlite, ...).  A
Spark deployment of the same pipeline would land those API payloads as
JSONL on object storage and index straight from there — JSONL is also
the interchange format of every large-scale LLM corpus (c4, The Pile,
RedPajama ship as .jsonl.gz).  This module makes JSONL a first-class
source: same DataFrame out, same rule SQL downstream.

Spark-first shape:

- **Write**: plain ``df.write.json`` — one file per task, no driver
  data path, scales to any partition count.  Spark's JSON writer
  escapes control characters, so arbitrary document text round-trips
  losslessly (pinned by the ``jsonl_source_ingest`` oracle).
- **Read with explicit schema**: schema-on-read with a caller-supplied
  or sampled schema.  At 100 TB you NEVER let Spark infer over the
  whole dataset (that is a full extra scan); ``read_jsonl`` takes the
  schema, and ``sample_jsonl_schema`` infers from a bounded sample
  (``samplingRatio`` + ``limit``) when the caller genuinely doesn't
  know it.
- Malformed lines are quarantined, not fatal: the typed read runs in
  ``DROPMALFORMED`` mode so one truncated line in one shard can't kill
  a 100-TB ingest, and ``corrupt_records`` re-derives the quarantine
  as a text scan + ``from_json`` probe (Spark disallows querying only
  the internal ``_corrupt_record`` column —
  UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — so the audit
  path parses explicitly instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def write_jsonl(df: DataFrame, path: str, num_files: int | None = None) -> None:
    """Write a DataFrame as JSONL; one file per partition (no driver
    funnel).  ``num_files`` coalesces small outputs — at scale leave it
    None and let the upstream partitioning dictate file count."""
    out = df.coalesce(num_files) if num_files else df
    out.write.mode("overwrite").json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> DataFrame:
    """Schema-on-read JSONL scan.  The schema is REQUIRED: inference is
    an extra full pass over the data — unacceptable at 100 TB.  The
    scan itself is split by file/block exactly like any text source, so
    parallelism comes for free.  Malformed lines are dropped
    (``DROPMALFORMED``); audit them via ``corrupt_records``."""
    return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)


def corrupt_records(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """The quarantine view: raw text of every line that failed to parse
    against ``schema`` — the audit/repair path for a long-running
    ingest.  A text scan + ``from_json`` probe (PERMISSIVE with an
    explicit corrupt-record field), because Spark rejects data-source
    plans that read only its internal ``_corrupt_record`` column."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    lines = spark.read.text(path)
    parsed = F.from_json(
        F.col("value"),
        full,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    # a top-level JSON ARRAY line is NOT corrupt: the JSON datasource
    # (read_jsonl) expands it into one row per element, but from_json
    # with a struct schema rejects it — probe the array shape too, or
    # the quarantine double-counts lines the reader kept and a
    # re-ingest of the quarantine would duplicate data
    arr_parsed = F.from_json(F.col("value"), T.ArrayType(schema))
    return (
        lines.where(parsed[CORRUPT_COL].isNotNull() & arr_parsed.isNull())
        .select(F.col("value").alias(CORRUPT_COL))
    )


def sample_jsonl_schema(
    spark: SparkSession, path: str, sample_lines: int = 10_000
) -> T.StructType:
    """Bounded-sample schema inference for when the schema is genuinely
    unknown: read at most ``sample_lines`` raw lines, infer from that
    in-memory sample.  Cost is O(sample), not O(dataset) — the
    difference between a metadata operation and a second full scan at
    100 TB."""
    sample = spark.read.text(path).limit(sample_lines)
    lines = [r.value for r in sample.collect()]
    rdd = spark.sparkContext.parallelize(lines, 1)
    return spark.read.json(rdd).schema


def register_jsonl(
    spark: SparkSession,
    path: str,
    view: str,
    schema: T.StructType,
) -> DataFrame:
    """JSONL file(s) → temp view, mirroring ``register_sqlite_db`` —
    the same rule SQL runs against parquet, sqlite, or JSONL sources."""
    df = read_jsonl(spark, path, schema)
    df.createOrReplaceTempView(view)
    return df
