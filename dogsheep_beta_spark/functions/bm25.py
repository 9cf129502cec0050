"""BM25 relevance — closed-form DataFrame expression (SURVEY.md §2 H9).

Reproduces SQLite FTS5's ``bm25()`` (the ``rank`` column the reference
orders by, __init__.py:28,41):

    score(doc) = Σ_phrases idf(ph) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
    idf(ph)    = max(ln((N - df + 0.5) / (df + 0.5)), 1e-6)   # FTS5 clamp
    rank       = -score      (more relevant = more negative, ORDER BY ASC)

with k1=1.2, b=0.75, equal column weights — tf and dl flattened across
the indexed columns (title, search_1), df = number of rows containing
the phrase in any indexed column, N = total rows, avgdl = mean dl.

Everything is a JVM column expression over the phrase-hits DataFrame —
no UDFs, no driver loops; corpus scalars (N, avgdl) arrive as literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75
IDF_FLOOR = 1e-6


def score_phrase_hits(
    phrase_hits: DataFrame,
    doc_lengths: DataFrame,
    n_docs: int,
    avgdl: float,
    type_filter: str | None = None,
) -> DataFrame:
    """(phrase_id, type, key, tf) → (type, key, rank).

    ``phrase_hits`` carries one row per (phrase, matching doc) with the
    flattened tf.  df per phrase is computed with a window-free
    self-aggregation + broadcast join (phrase count is tiny).

    ``type_filter`` prunes hits to one source type BEFORE the heavy
    per-doc aggregation — the pushdown for ``?type=`` requests.  BM25
    stats stay corpus-global (df is aggregated over the UNFILTERED
    hits, and N/avgdl are index-wide scalars), exactly matching FTS5's
    behavior where MATCH ranks against the whole index and the type
    equality is an outer WHERE (__init__.py:26-43,123-131): per-doc
    rank values are bit-identical with or without the pushdown.
    """
    df_per_phrase = phrase_hits.groupBy("phrase_id").agg(
        F.count(F.lit(1)).alias("df")
    )
    scoped = (
        phrase_hits.filter(F.col("type") == type_filter)
        if type_filter is not None
        else phrase_hits
    )
    hits = scoped.join(F.broadcast(df_per_phrase), "phrase_id").join(
        doc_lengths, ["type", "key"], "left"
    )
    dl = F.coalesce(F.col("dl"), F.lit(0)).cast("double")
    idf = F.greatest(
        F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        F.lit(IDF_FLOOR),
    )
    denom = F.col("tf") + K1 * (1 - B + B * dl / F.lit(float(avgdl) or 1.0))
    contrib = idf * (F.col("tf") * (K1 + 1)) / denom
    return (
        hits.withColumn("contrib", contrib)
        .groupBy("type", "key")
        .agg((-F.sum("contrib")).alias("rank"))
    )
