"""SQL-callable engine functions (Spark 4 SQL UDFs).

The reference's rule SQL runs inside an environment that pre-registers
helper SQL functions — datasette exposes ``escape_fts`` to every query
(``datasette.utils``, used at ``reference/dogsheep_beta/__init__.py:112,
144``), and SQLite itself provides the scalar vocabulary the rules lean
on.  A user porting rules expects the same functions to exist in the
engine's SQL dialect, not only as Python column helpers.

``register_sql_functions`` creates TEMPORARY SQL functions (Spark 4
``CREATE FUNCTION … RETURN <expr>``) whose bodies are pure SQL
expressions — they inline into the calling plan and stay inside
whole-stage codegen, costing exactly what the equivalent column
expression costs.  No Python UDF, no serialization boundary; each body
mirrors (and is pinned against) the engine's tested implementation:

- ``dbs_tokenize(s)`` / ``dbs_token_count(s)`` — the portable
  tokenizer (`functions/tokenizer.py:tokenize_expr`), SURVEY §2 H7.
- ``dbs_escape_fts(q)`` — quote-every-bareword escape with embedded
  quotes replaced by spaces (token-identical to the parsed form, since
  the tokenizer treats both as separators): the string form of the
  engine's escape fallback (`plans/match.py:escape_match`, H8 / B6).
- ``dbs_intcomma(n)`` — thousands separators
  (`presentation.py:intcomma`, H6).
- ``dbs_hash_bucket(id, buckets)`` — the deterministic sampling bucket
  (`operators/sampling.py:hash_bucket`, salt-free form), so rule SQL
  can express reproducible splits/subsampling inline.
- ``dbs_time_bucket(ts, secs)`` — fixed-width bucketing
  (`operators/temporal.py:time_bucket`), floor semantics incl.
  negative epochs.

Registration is idempotent (CREATE OR REPLACE) and session-scoped,
matching the reference's per-connection function registration model.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_FUNCTIONS = (
    # portable tokenizer: lower → split on non-[a-z0-9] → drop empties
    """
    CREATE OR REPLACE TEMPORARY FUNCTION dbs_tokenize(s STRING)
    RETURNS ARRAY<STRING>
    RETURN filter(split(lower(coalesce(s, '')), '[^a-z0-9]+'),
                  x -> x <> '')
    """,
    # composes dbs_tokenize so there is ONE tokenizer definition to pin
    """
    CREATE OR REPLACE TEMPORARY FUNCTION dbs_token_count(s STRING)
    RETURNS INT
    RETURN size(dbs_tokenize(s))
    """,
    # escape fallback, string form: every whitespace-separated bit
    # that still carries a token becomes a quoted phrase, operators
    # disabled.  Embedded quotes become spaces (the tokenizer treats
    # both as separators, so the parsed phrase has IDENTICAL tokens to
    # plans/match.escape_match — pinned by a parser round-trip test).
    # The split class is UNICODE whitespace plus the 0x1c-0x1f
    # separators, matching Python str.split() in escape_match — Java's
    # bare \\s is ASCII-only and would glue 'foo\\u00a0bar' into ONE
    # phrase (adjacency required) where the engine makes two.  The
    # tokenizer body is repeated inline here because Spark 4's SQL-
    # function inliner cannot pass a LAMBDA VARIABLE into another SQL
    # function (dbs_tokenize(x) inside filter's x -> ... fails
    # analysis with MISSING_ATTRIBUTES); dbs_token_count composes at
    # top level, this one cannot.
    """
    CREATE OR REPLACE TEMPORARY FUNCTION dbs_escape_fts(q STRING)
    RETURNS STRING
    RETURN array_join(
        transform(
            filter(split(coalesce(q, ''), '(?U)[\\\\s\\\\x1c-\\\\x1f]+'),
                   x -> size(filter(split(lower(x), '[^a-z0-9]+'),
                                    y -> y <> '')) > 0),
            t -> concat('"', replace(t, '"', ' '), '"')),
        ' ')
    """,
    """
    CREATE OR REPLACE TEMPORARY FUNCTION dbs_intcomma(n BIGINT)
    RETURNS STRING
    RETURN format_number(n, 0)
    """,
    # first 8 md5 hex chars → 32-bit int → mod buckets (sampling.py).
    # NULL id → NULL bucket, exactly like sampling.hash_bucket (md5 of
    # NULL propagates) — a coalesce-to-'' here put NULL-id rows in a
    # concrete bucket the engine-side sampler would never choose.
    """
    CREATE OR REPLACE TEMPORARY FUNCTION dbs_hash_bucket(
        id STRING, buckets INT)
    RETURNS INT
    RETURN CAST(CAST(conv(substring(md5(id), 1, 8),
                          16, 10) AS BIGINT) % buckets AS INT)
    """,
    # floor-to-width bucketing, negative epochs floor like DuckDB
    """
    CREATE OR REPLACE TEMPORARY FUNCTION dbs_time_bucket(
        ts TIMESTAMP, secs BIGINT)
    RETURNS TIMESTAMP
    RETURN timestamp_micros(
        CAST(floor(unix_micros(ts) / (secs * 1000000)) AS BIGINT)
        * secs * 1000000)
    """,
)


def register_sql_functions(spark: SparkSession) -> None:
    """Create (or replace) every engine SQL function in this session."""
    for ddl in _FUNCTIONS:
        spark.sql(ddl)
