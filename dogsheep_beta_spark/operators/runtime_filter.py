"""Bloom-filter-pruned semi-join (Catalyst runtime filter, SURVEY §2 C).

The reference's FK filtering is always a full semi-join through SQLite
(search rows ⋉ matching docs).  At 100 TB the equivalent join reads
the entire fact side through the shuffle before a single probe-side
row is dropped.  Spark's `InjectRuntimeFilter` rule fixes exactly
this: when the dimension side carries a selective filter, Catalyst
builds a bloom filter over the dim keys (`bloom_filter_agg`) and
pushes a `might_contain` probe BELOW the fact-side shuffle — shuffled
volume becomes proportional to the (approximate) match set, not the
fact table.

Spark-first: we don't hand-build the bloom filter (the SQL functions
aren't public); we arrange the plan so Catalyst injects its own, and
plan-assert the injection (tests/test_plans.py).  The two session
knobs set here exist because local test data is far below the
defaults' size gates:

- ``runtime.bloomFilter.enabled`` — off by default in this Spark
  build; always-on is the right setting for selective-dim joins.
- ``applicationSideScanSizeThreshold=0`` — default 10GB means "only
  bother when the fact scan is huge"; locally the fact side is KB, so
  the gate must come down to exercise the 100-TB-regime plan.  On a
  real cluster the default gate is already the correct behavior and
  this override is unnecessary.

The bloom probe is a pure overapproximation (no false negatives), so
the join result is EXACTLY the plain semi-join — which is what the
DuckDB oracle runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def bloom_pruned_semi_join(
    fact: DataFrame, dim: DataFrame, cond: Column
) -> DataFrame:
    """fact ⋉ dim with a Catalyst-injected bloom runtime filter.

    The SHUFFLE_HASH hint keeps the dim side out of a broadcast (at
    100 TB a selective dim doesn't broadcast; the hint makes local mode
    execute that same shape).  NOTE: transformations applied AFTER this
    join build a fresh QueryExecution that re-optimizes under the
    session's live confs — finish composing the query, then call
    ``freeze_bloom_plan`` on the FINAL DataFrame."""
    return fact.join(dim.hint("SHUFFLE_HASH"), cond, "left_semi")


def freeze_bloom_plan(df: DataFrame) -> DataFrame:
    """Force Catalyst to optimize ``df`` NOW under the 100-TB-regime
    runtime-filter confs, then restore the session.

    InjectRuntimeFilter (correctly) skips joins whose dim side is
    broadcastable-by-size — a broadcast join probes map-side anyway, so
    a bloom filter would be pure overhead.  At 100 TB a selective dim
    is far above the broadcast threshold and injection fires on its
    own; locally the KB-sized dim would suppress the very plan we need
    to pin.  So the local-mode shim: temporarily drop the broadcast
    threshold and size gates, materialize the optimized logical plan
    (the DataFrame's QueryExecution caches it, so the injected bloom
    survives execution), then restore every conf — later queries in
    the shared driver session keep their broadcast plans.

    Must be called on the LAST DataFrame of the query: any further
    transformation re-optimizes from the logical plan under live confs
    and silently drops the injected filter."""
    spark = df.sparkSession
    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        df._jdf.queryExecution().optimizedPlan()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return df
