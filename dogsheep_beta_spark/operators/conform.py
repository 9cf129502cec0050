"""Conform layer — schema probe + additive migration + defaults.

Reference semantics reproduced (SURVEY.md §2 A4/A7/B8, §1.2):
- rule output columns are *probed lazily* (``df.columns`` — no scan; the
  reference runs the rule with ``limit 0``, utils.py:68-70);
- missing canonical columns are filled with NULL (table-default behavior,
  utils.py:83-88);
- ``key`` is coerced to string (utils.py:7 + tests/test_cli.py:80);
- ``is_public`` is NOT NULL DEFAULT 0 (utils.py:18-21);
- ``category`` is an integer FK.

All of this is pure column expressions — stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dogsheep_beta_spark.schema import SEARCH_INDEX_COLUMNS, SEARCH_INDEX_SCHEMA

_TYPES = {f.name: f.dataType for f in SEARCH_INDEX_SCHEMA.fields}


def conform(df: DataFrame, type_tag: str) -> DataFrame:
    """Conform one rule-query output to the canonical search_index schema.

    The type tag is injected as a literal column — the Spark replacement
    for the reference's string surgery on the SQL text (utils.py:44-47,
    SURVEY.md §2 A3).

    Column matching is CASE-INSENSITIVE like SQLite's: a rule written
    as ``SELECT id AS Key`` resolves to the canonical ``key`` column in
    the reference, so it must here too — a case-sensitive probe
    silently NULLed the column (and last_writer_wins then collapsed
    the whole rule to one row per type).
    """
    by_fold = {c.lower(): c for c in df.columns}
    cols = []
    for name in SEARCH_INDEX_COLUMNS:
        actual = by_fold.get(name)
        if name == "type":
            cols.append(F.lit(type_tag).alias("type"))
        elif actual is None:
            default = F.lit(0) if name == "is_public" else F.lit(None)
            cols.append(default.cast(_TYPES[name]).alias(name))
        elif name == "is_public":
            cols.append(
                F.coalesce(df[actual].cast("int"), F.lit(0)).alias(name)
            )
        else:
            cols.append(df[actual].cast(_TYPES[name]).alias(name))
    return df.select(*cols)
