"""Sequence packing — documents → fixed-capacity training sequences.

The pretraining data path ends with packing: token streams are laid
into fixed-length sequences (e.g. 512/2048/8192 tokens).  Two public
formulations, both here:

- ``pack_contiguous``: concatenate-then-chunk.  Documents stream in a
  deterministic order and fill sequences back-to-back; a document
  whose tokens straddle a boundary is split across the two sequences.
  Assignment is a pure function of the running token count, so it is
  ONE window cumulative sum — fully parallel, exactly SQL-expressible.
- ``pack_greedy``: next-fit bin packing.  Documents are never split; a
  document that would overflow the open sequence closes it and starts
  the next.  Inherently sequential WITHIN a shard (each decision
  depends on the previous fill level), so it runs as one
  ``applyInPandas`` pass per shard — shards in parallel, a tight
  pandas loop inside.

Scale design: both operators key on a ``shard`` column (source,
date-bucket, hash-prefix — anything with enough cardinality to spread
the cluster).  A GLOBAL ordered pack would serialize the corpus
through one window partition / one task; per-shard packing is what
real pipelines do anyway (shards map to output files).  The window
cumsum shuffles once on the shard key; the greedy pass is map-only
after the same shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_contiguous(
    df: DataFrame,
    id_col: str,
    tok_col: str,
    capacity: int,
    shard_col: str,
    order_col: str | None = None,
) -> DataFrame:
    """(id, shard, n_tok, bin, offset): concatenate-then-chunk packing.

    ``bin`` is the sequence index where the document STARTS
    (floor(cum_before / capacity)); ``offset`` its position inside that
    sequence.  Long documents simply span multiple sequences — exactly
    how GPT-style chunking treats them."""
    order_col = order_col or id_col
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(tok_col).over(w), F.lit(0)).cast("long")
    return df.select(
        F.col(id_col).alias("id"),
        F.col(shard_col).alias("shard"),
        F.col(tok_col).cast("long").alias("n_tok"),
        F.floor(cum_before / capacity).cast("long").alias("bin"),
        (cum_before % capacity).cast("long").alias("offset"),
    )


def pack_greedy(
    df: DataFrame,
    id_col: str,
    tok_col: str,
    capacity: int,
    shard_col: str,
    order_col: str | None = None,
) -> DataFrame:
    """(id, shard, n_tok, bin): next-fit packing, documents unsplit.

    Per shard: walk documents in order; if the open sequence already
    holds at least one document and can't take the next one
    (fill + n_tok > capacity), close it and open the next.  An oversized
    document (> capacity) occupies a sequence alone — the guard counts
    documents, not fill, so zero-token documents can't share its bin.  The per-shard loop is genuine sequential state —
    the honest implementation is a pandas pass per shard group, shards
    running in parallel (same shape as stateful sessionization)."""
    order_col = order_col or id_col
    # the id passes through with its OWN type (string doc ids work,
    # matching pack_contiguous) — a hardcoded long crashed in Arrow
    schema = T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType, True),
            T.StructField("shard", T.StringType(), True),
            T.StructField("n_tok", T.LongType(), True),
            T.StructField("bin", T.LongType(), False),
        ]
    )

    cap = capacity

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__ord").reset_index(drop=True)
        bins = []
        b, fill, n_in_bin = 0, 0, 0
        for t in pdf["n_tok"]:
            t = int(t) if pd.notna(t) else 0
            # Close the open bin whenever it already holds a document and
            # the next one would overflow — counted by docs, not by fill,
            # so zero-token documents can't let an oversized doc share a bin.
            if n_in_bin > 0 and fill + t > cap:
                b, fill, n_in_bin = b + 1, 0, 0
            bins.append(b)
            fill += t
            n_in_bin += 1
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "shard": pdf["shard"],
                "n_tok": pdf["n_tok"],
                "bin": bins,
            }
        )

    prepped = df.select(
        F.col(id_col).alias("id"),
        F.col(shard_col).cast("string").alias("shard"),
        F.col(tok_col).cast("long").alias("n_tok"),
        F.col(order_col).alias("__ord"),
    )
    return prepped.groupBy("shard").applyInPandas(pack, schema)


def bin_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """(shard, bin, n_docs, fill, utilization) — the packing report.

    Exact for ``pack_greedy`` output (documents are unsplit, so a bin's
    fill is the sum of its documents).  For ``pack_contiguous`` the
    report attributes a straddling document's FULL token count to the
    bin where it starts, so fill/utilization can exceed capacity for
    start bins and undercount the spilled-into bins — contiguous
    packing fills every bin to exactly ``capacity`` by construction,
    so the per-bin report is only meaningful for the greedy packer."""
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("fill"),
        F.round(F.sum("n_tok") / F.lit(float(capacity)), 6).alias("utilization"),
    )
