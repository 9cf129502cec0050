"""Entity resolution / record linkage: blocked pairwise matching.

At corpus scale you can never score all O(n^2) record pairs; the
public technique (Fellegi & Sunter 1969; Splink, Magellan, Dedoop)
is BLOCKING: compute a cheap deterministic key per record, self-join
on the key so only within-block pairs are scored, then apply an
edit-distance measure and keep matches.  This is the same
candidate-generation shape as the LSH band join in
``operators/dedup.py`` — an equi-join on a derived key with a hard
cap on block size — applied to structured identity columns instead
of shingled text.

Spark-first notes:

- The blocking key is pure string expressions (``lower/trim/substr``)
  and the score is the JVM ``levenshtein`` builtin with its
  short-circuit ``threshold`` argument (Spark >= 3.5 computes a
  banded DP and bails out at ``threshold+1``) — no Python anywhere.
- Oversized blocks (junk keys: empty or constant names) are removed
  BEFORE the join by a partial-aggregated key count + broadcast
  anti-join, so the shuffled pair count is bounded by
  ``sum_b |b|^2`` over blocks with ``|b| <= max_block`` — the same
  guarantee the LSH ``max_bucket`` cap gives (dedup.py:286).
- Best-match reduction uses ``min_by`` (partial-aggregable map-side
  combine), not a window: at 100 TB the per-entity argmin folds in
  the map stage instead of re-sorting every block.

Reference parity: the reference has no linkage operator (its dedup
is SQLite ``REPLACE INTO`` on exact keys — dogsheep_beta/utils.py);
this extends the dedup family the same way MinHash/SimHash do.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalized(name_col: str):
    """Case/whitespace-folded comparison form of an identity column."""
    return F.lower(F.trim(F.col(name_col)))


def blocked_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: Sequence[str] = (),
    prefix_len: int = 16,
    max_block: int = 1000,
) -> DataFrame:
    """Within-block candidate pairs ``(id_a < id_b)`` with both
    normalized names carried.

    The blocking key is ``block_cols`` plus the first ``prefix_len``
    chars of the normalized name.  Blocks larger than ``max_block``
    are dropped entirely (junk keys — the caller chose a bad blocking
    scheme for them); the drop is an aggregate + broadcast anti-join,
    never a window over the data.
    """
    base = df.select(
        F.col(id_col).alias("__id"),
        _normalized(name_col).alias("__nm"),
        *[F.col(c) for c in block_cols],
    ).withColumn("__pfx", F.substring("__nm", 1, prefix_len))

    keys = [*block_cols, "__pfx"]
    oversized = (
        base.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .filter(F.col("__cnt") > max_block)
        .select(*keys)
    )
    # Oversized-key set is tiny by construction (each key it contains
    # represents > max_block records), so broadcast the anti-join.
    pruned = base.join(F.broadcast(oversized), on=keys, how="left_anti")

    a = pruned.select(
        *keys,
        F.col("__id").alias("id_a"),
        F.col("__nm").alias("nm_a"),
    )
    b = pruned.select(
        *keys,
        F.col("__id").alias("id_b"),
        F.col("__nm").alias("nm_b"),
    )
    return a.join(b, on=keys).filter(F.col("id_a") < F.col("id_b"))


def link_entities(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: Sequence[str] = (),
    prefix_len: int = 16,
    max_dist: int = 1,
    max_block: int = 1000,
) -> DataFrame:
    """Scored match pairs: blocked candidates with
    ``levenshtein(nm_a, nm_b) <= max_dist``.

    Output: ``id_a, id_b, nm_a, nm_b, dist`` (id_a < id_b).  The
    threshold form of ``levenshtein`` is used so the DP bails out at
    ``max_dist + 1`` — on long near-miss strings that is the
    difference between O(len^2) and O(len * max_dist) per pair.
    """
    pairs = blocked_pairs(
        df, id_col, name_col, block_cols, prefix_len, max_block
    )
    dist = F.levenshtein("nm_a", "nm_b", max_dist)
    return (
        pairs.withColumn("dist", dist)
        .filter(F.col("dist") >= 0)  # threshold form returns -1 above
        .select("id_a", "id_b", "nm_a", "nm_b", "dist")
    )


def best_match(matches: DataFrame) -> DataFrame:
    """For each later record, its single best earlier match: min
    ``(dist, id_a)`` per ``id_b`` — the canonical-pointer reduction
    used by incremental linkage (each new record links to the best
    already-canonical record).  ``min_by`` over a struct key keeps
    the argmin partial-aggregable (map-side combine), unlike a
    row_number window which would re-sort every block post-shuffle.
    """
    ordkey = F.struct(F.col("dist"), F.col("id_a"))
    payload = F.struct(F.col("id_a"), F.col("nm_a"), F.col("dist"))
    best = matches.groupBy("id_b", "nm_b").agg(
        F.min_by(payload, ordkey).alias("m")
    )
    return best.select(
        F.col("id_b").alias("entity_id"),
        F.col("nm_b").alias("entity_name"),
        F.col("m.id_a").alias("match_id"),
        F.col("m.nm_a").alias("match_name"),
        F.col("m.dist").cast("int").alias("dist"),
    )
