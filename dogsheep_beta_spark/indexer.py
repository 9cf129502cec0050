"""The indexer — phase 1 of the engine (SURVEY.md §3.1).

Reference pipeline (cli.py:33-41 → utils.py:30-65): per (db, rule) run the
extraction SQL, inject the type tag, conform columns, REPLACE INTO the
single ``search_index`` table, then rebuild the FTS index.

Spark pipeline: ``spark.sql(rule.sql)`` per rule → conform → unionByName →
last-writer-wins dedup → (optionally) write Parquet; the FTS index build
(postings + corpus stats) lives in operators/fts_index.py.

Scale design: each rule plan keeps Catalyst pushdown/pruning intact (the
rule SQL is analyzed lazily, never collected); the only shuffle in the
whole build is the upsert window on (type, key).  At 100 TB, write
partitioned by ``type`` so per-type queries partition-prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dogsheep_beta_spark.config import Rule, rules_from_config
from dogsheep_beta_spark.operators.conform import conform
from dogsheep_beta_spark.operators.upsert import last_writer_wins, union_conformed


def rule_output(spark: SparkSession, rule: Rule) -> DataFrame:
    """Run one extraction rule (SURVEY §2 A2) and conform it (A3/A4/A7/B8).

    ``spark.sql`` analyzes the rule lazily — the schema probe that the
    reference does with ``limit 0`` (utils.py:68-70) is free here.
    """
    return conform(spark.sql(rule.sql), rule.type_tag)


def build_search_index(
    spark: SparkSession,
    config: dict,
    databases: list[str] | None = None,
) -> DataFrame:
    """Build the deduplicated ``search_index`` DataFrame from a rules config.

    Equivalent of ``run_indexer`` minus persistence (utils.py:30-65).
    Sources referenced by rule SQL must already be registered as views.
    """
    rules = rules_from_config(config, databases)
    if not rules:
        raise ValueError("no rules to index")
    # rule SQL runs with the engine's SQL functions in scope (H11) —
    # the reference's rules likewise run where datasette/SQLite helper
    # functions are pre-registered.  Idempotent per session.
    from dogsheep_beta_spark.functions.sql_udfs import register_sql_functions

    register_sql_functions(spark)
    parts = [
        rule_output(spark, rule).withColumn("load_seq", F.lit(i))
        for i, rule in enumerate(rules)
    ]
    return last_writer_wins(union_conformed(parts))


def run_indexer(
    spark: SparkSession,
    config: dict,
    output_path: str,
    databases: list[str] | None = None,
    partition_by_type: bool = False,
    compact_partitions: int = 0,
    sort_by_timestamp: bool = False,
    zorder: bool = False,
) -> DataFrame:
    """Build and persist search_index as Parquet (the full A5→A8/A11 path).

    - ``partition_by_type`` is the 100 TB layout (SURVEY §7.5): per-type
      partition pruning for the `type` facet filter; small/local runs
      keep a flat layout to avoid tiny files.
    - ``compact_partitions`` is the optimize/vacuum analog (A11,
      utils.py:64-65): coalesce the write into N files so a rebuild
      doesn't leave shuffle-width file counts.
    - ``sort_by_timestamp`` sorts rows within each output file so the
      parquet min/max stats make timeline scans skip whole row groups
      (the B-tree-on-timestamp analog, A8).
    - ``zorder`` instead clusters files in Morton order over
      (type-hash, timestamp-day) — `operators/zorder.py`, the OPTIMIZE
      ZORDER analog: the timeline page's `type = … AND date = …` filter
      pair then prunes on BOTH dimensions via ordinary file stats,
      without partitioning's directory explosion.  File count comes
      from ``compact_partitions`` (default 32).
    """
    df = build_search_index(spark, config, databases)
    if zorder and partition_by_type:
        # the hive partitionBy re-splits the range-partitioned files,
        # shredding the Morton clustering into up to files×types tiny
        # files — the two layouts are alternatives, not composable
        raise ValueError(
            "zorder and partition_by_type are mutually exclusive "
            "layouts: z-order already clusters the type dimension "
            "(via its hash dim) without the directory explosion"
        )
    if zorder:
        from dogsheep_beta_spark.operators.zorder import zorder_key

        # timestamp is a lexicographic ISO string (F4); its first 19
        # chars parse to a second-resolution timestamp for the day dim.
        z = zorder_key(
            [
                (F.col("type"), "hash"),
                (
                    F.coalesce(
                        F.to_timestamp(
                            F.substring(F.col("timestamp"), 1, 19)
                        ),
                        F.lit("1970-01-01").cast("timestamp"),
                    ),
                    "day",
                ),
            ]
        )
        df = (
            df.withColumn("__z", z)
            .repartitionByRange(compact_partitions or 32, F.col("__z"))
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    elif compact_partitions:
        df = df.repartition(compact_partitions)
    if sort_by_timestamp and not zorder:
        df = df.sortWithinPartitions(F.col("timestamp").desc_nulls_last())
    writer = df.write.mode("overwrite")
    if partition_by_type:
        writer = writer.partitionBy("type")
    writer.parquet(output_path)
    return spark.read.parquet(output_path)
