"""CSV source/sink (SURVEY.md §2 A1 — format path, sibling of jsonl.py).

Dogsheep tools ingest CSV exports (healthkit, swarm, google-takeout
dumps all arrive as CSV/TSV); large-scale corpora ship CSV metadata
(index files, URL lists) beside the data.  Same contract as the JSONL
module: explicit schema (inference is a second full scan — never at
100 TB), malformed-line tolerance, quarantine view, DataFrame out so
the same rule SQL runs downstream.

CSV-specific care: documents contain newlines, quotes, and commas, so
the writer quotes every field and doubles embedded quotes (``quoteAll``
with ``escape='"'`` — RFC-4180 quote-doubling, what generic CSV readers
expect) and the reader enables ``multiLine`` — a round-trip is lossless,
which the ``csv_source_ingest`` oracle pins byte-exactly.  multiLine
CSV sacrifices intra-file split parallelism (a quoted newline means
line boundaries aren't record boundaries), so the writer keeps files
small-and-many: parallelism across files, correctness within."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_OPTS = {
    "header": "true",
    "quote": '"',
    "escape": '"',
    "multiLine": "true",
    # Hive/MySQL's \N convention: keeps NULL distinguishable from ''.
    # KNOWN LIMIT (inherent to CSV, not this reader): a field whose
    # text is the literal 2-char string \N reads back as NULL — CSV has
    # no out-of-band null marker, and Spark's reader applies nullValue
    # after unquoting, so no sentinel can be collision-free.  Pinned by
    # test_csv_null_sentinel_collision_documented; corpora where \N is
    # live content should ship as JSONL (sources/jsonl.py, lossless).
    "nullValue": "\\N",
}


def write_csv(df: DataFrame, path: str, num_files: int | None = None) -> None:
    """Write as quoted CSV, one file per partition.  ``quoteAll`` so
    embedded newlines/commas/quotes round-trip; a sentinel nullValue
    keeps NULL distinguishable from ''."""
    out = df.coalesce(num_files) if num_files else df
    (
        out.write.mode("overwrite")
        .options(**_OPTS)
        .option("quoteAll", "true")
        .csv(path)
    )


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Schema-on-read CSV scan; malformed rows dropped
    (``DROPMALFORMED``), audit them via ``corrupt_csv_records``.

    Spark CSV gotcha (column pruning): a query that reads NO columns —
    a bare ``count()`` — parses nothing, so malformed rows are not
    dropped from it; any query touching real columns sees the typed,
    filtered rows.  Pinned by test_corrupt_csv_records_quarantine."""
    return (
        spark.read.schema(schema)
        .options(**_OPTS)
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )


def corrupt_csv_records(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Rows that fail the typed parse, PERMISSIVE-captured into an
    explicit corrupt column.  The ``.cache()`` is the load-bearing
    workaround for Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN
    restriction (the documented remedy: materialize the parsed result,
    then select the corrupt column) — do not remove it."""
    corrupt = "_corrupt_record"
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt, T.StringType(), True)]
    )
    df = (
        spark.read.schema(full)
        .options(**_OPTS)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .csv(path)
        .cache()  # documented Spark workaround: corrupt-only queries
    )
    return df.where(F.col(corrupt).isNotNull()).select(corrupt)


def register_csv(
    spark: SparkSession, path: str, view: str, schema: T.StructType
) -> DataFrame:
    """CSV file(s) → temp view — same rule SQL as parquet/sqlite/jsonl."""
    df = read_csv(spark, path, schema)
    df.createOrReplaceTempView(view)
    return df
