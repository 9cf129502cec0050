"""Per-result hydration — C3 in SURVEY.md §2.

Reference behavior (__init__.py:161-168; README.md:135-162): for each of
the ≤100 search results, run the rule's ``display_sql`` with ``:key``
(and optionally ``:q``) bound, and attach the first row as ``display``.
That is an N+1 point-query pattern, explicitly justified there by
SQLite's cheap-small-queries property.

Spark decorrelates it manually (SURVEY §4): ONE query per (db, type)
with the result keys pushed down as an ``IN`` list — a broadcast-join
shape with a ≤100-element build side — instead of ≤100 round trips.

Two surfaces:
- ``rewrite_display_sql`` + ``hydrate_results``: accepts the reference's
  own ``... where <col> = :key`` SQL verbatim and batches it.
- ``hydrate_join``: the same semantics as a declarative DataFrame join,
  for plans that want hydration inside one Catalyst-optimized query.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KEY_EQ = re.compile(r"([A-Za-z_][\w.]*)\s*=\s*:key")
# display_sql shapes whose meaning depends on running ONCE PER KEY
# (the reference's actual execution model): a LIMIT or ORDER BY inside
# the query must apply within each key's rows, not globally.
_PER_KEY_ONLY = re.compile(r"\b(limit|order\s+by)\b", re.IGNORECASE)


def _sql_string_literal(s: str) -> str:
    """Spark SQL single-quoted literal.  Backslash must be escaped as
    well as the quote: Spark's parser treats ``\\`` as an escape inside
    string literals, so quote-doubling alone lets a value ending in a
    backslash swallow the closing quote — a parse failure at best and,
    for the user-controlled ``:q`` binding, an injection vector."""
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


def rewrite_display_sql(sql: str, keys: list[str], q: str | None = None):
    """Rewrite ``... where <col> = :key`` into a batched IN query.

    Returns (rewritten_sql, key_column_name).  The equality predicate is
    replaced by ``true`` and re-imposed outside over the whole key set,
    with a string cast on both sides to mirror SQLite's loose affinity
    (keys are stored as TEXT, source pks are usually INTEGER —
    utils.py:7 + tests/test_cli.py:80).
    """
    m = _KEY_EQ.search(sql)
    if not m:
        raise ValueError(
            "display_sql must contain a '<column> = :key' predicate "
            f"(reference pattern, README.md:135-162): {sql!r}"
        )
    lhs = m.group(1)
    col = lhs.split(".")[-1]
    inner = sql[: m.start()] + "true" + sql[m.end() :]
    if q is not None:
        inner = inner.replace(":q", _sql_string_literal(q))
    in_list = ", ".join(_sql_string_literal(k) for k in keys) or "''"
    rewritten = (
        f"SELECT * FROM ({inner}) __hydrate "
        f"WHERE CAST(__hydrate.{col} AS STRING) IN ({in_list})"
    )
    return rewritten, col


def hydrate_results(
    spark: SparkSession,
    result_rows: list[dict],
    display_sqls: dict[str, str],
    q: str | None = None,
) -> list[dict]:
    """Attach ``display`` dicts to collected result rows.

    ``display_sqls`` maps the full type tag ("db/rule") to its
    display_sql.  One batched Spark query per type present in the
    results (≤ #types queries total, not ≤100 — the decorrelation).
    First-row-wins per key, like the reference's ``rows.first()``.
    """
    by_type: dict[str, list[str]] = {}
    for r in result_rows:
        if r["type"] in display_sqls:
            by_type.setdefault(r["type"], []).append(str(r["key"]))

    display_maps: dict[str, dict[str, dict]] = {}
    for type_tag, keys in by_type.items():
        sql = display_sqls[type_tag]
        if _PER_KEY_ONLY.search(sql):
            # LIMIT / ORDER BY inside display_sql are PER-KEY semantics
            # in the reference (it runs the SQL once per result row,
            # __init__.py:161-168): batching would apply the limit
            # globally BEFORE the key filter and drop rows.  Run these
            # per key — bounded by the ≤100-result page, the same
            # justified-driver-side class as the display path itself.
            fetched = {}
            for k in dict.fromkeys(keys):
                # inline the binding, query untouched — the batching
                # rewrite would hoist the key filter above the LIMIT
                per = sql.replace(":key", _sql_string_literal(k))
                if q is not None:
                    per = per.replace(":q", _sql_string_literal(q))
                rows = spark.sql(per).limit(1).collect()
                if rows:
                    fetched[k] = rows[0].asDict(recursive=True)
            display_maps[type_tag] = fetched
            continue
        rewritten, col = rewrite_display_sql(sql, keys, q)
        fetched = {}
        for row in spark.sql(rewritten).collect():
            d = row.asDict(recursive=True)
            k = str(d[col])
            fetched.setdefault(k, d)  # first row wins (__init__.py:166-168)
        display_maps[type_tag] = fetched

    out = []
    for r in result_rows:
        r = dict(r)
        r["display"] = display_maps.get(r["type"], {}).get(str(r["key"]))
        out.append(r)
    return out


def hydrate_join(
    results: DataFrame, display_view: DataFrame, display_key: str
) -> DataFrame:
    """C3 as one declarative plan, in two broadcast joins:

    1. prune the display view to the result keys with a broadcast
       LEFT SEMI (build side = the ≤100-row key set) — at scale this is
       what keeps the display scan from materializing the whole table;
    2. broadcast the pruned (≤100-row) view back into a LEFT join that
       preserves every result row.

    (A single ``broadcast(results).join(view, "left")`` cannot be a
    broadcast join at all — Spark may only broadcast the non-preserved
    side of an outer join — and silently degrades to sort-merge.)"""
    keyed = display_view.withColumn(
        "__display_key", F.col(display_key).cast("string")
    )
    keys = results.select(F.col("key").alias("__k")).distinct()
    pruned = keyed.join(
        F.broadcast(keys), keyed["__display_key"] == F.col("__k"), "left_semi"
    )
    # qualified references: an unqualified col("key") is ambiguous when
    # the display view itself has a column named "key"
    return (
        results.join(
            F.broadcast(pruned),
            results["key"] == pruned["__display_key"],
            "left",
        )
        .drop("__display_key")
    )
