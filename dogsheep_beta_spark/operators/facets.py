"""Count + facet aggregations (SURVEY.md §2 D1-D4, C4).

The reference computes a filtered total count plus three column facets
(type, category, is_public) and one date facet over ``timestamp`` —
delegated to Datasette's ColumnFacet/DateFacet, which run one
``GROUP BY col ORDER BY count DESC LIMIT facet_size`` each
(__init__.py:200-215).

Key improvement over the reference (SURVEY.md §3.3): the reference
computes results and facets via two independent execution paths that can
disagree; here every aggregate derives from ONE ``filtered_df``, which the
query layer persists across count + 4 facets + top-k (§4 table, last row).

Determinism: ties in count are broken by the facet value ascending so
hash-comparison against the oracle is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_FACET_SIZE = 30  # Datasette default facet_size

FACET_COLUMNS = ("type", "category", "is_public")  # __init__.py:44,202


def filtered_count(df: DataFrame) -> int:
    """D1 — exact count of the filtered set."""
    return df.count()


def column_facet(
    df: DataFrame, column: str, limit: int = DEFAULT_FACET_SIZE
) -> DataFrame:
    """D2 — value distribution of one column over the filtered set.

    Partial (map-side) aggregation then a single shuffle on the facet
    column; the final limit is a TakeOrdered, not a global sort.
    """
    return (
        df.groupBy(F.col(column).alias("value"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc_nulls_last("value"))
        .limit(limit)
    )


def date_facet(
    df: DataFrame, column: str = "timestamp", limit: int = DEFAULT_FACET_SIZE
) -> DataFrame:
    """D3 — counts bucketed by ``date(timestamp)`` (Datasette DateFacet).

    ``to_date`` parses the ISO-8601 text with either ``T`` or space
    separator, matching SQLite's ``date()`` (SURVEY §2 B4/D3/H2).
    """
    return (
        df.filter(F.col(column).isNotNull())
        .groupBy(F.to_date(F.col(column)).alias("value"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc_nulls_last("value"))
        .limit(limit)
    )


def facet_with_labels(facet_df: DataFrame, categories_df: DataFrame) -> DataFrame:
    """C4 — expand the ``category`` FK to its label via a broadcast join."""
    return (
        facet_df.join(
            F.broadcast(categories_df),
            facet_df.value == categories_df.id,
            "left",
        )
        .select(
            facet_df.value,
            categories_df.name.alias("label"),
            facet_df["count"],
        )
        .orderBy(F.desc("count"), F.asc_nulls_last("value"))
    )
