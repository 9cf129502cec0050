"""Deduplication operators — the training-data-pipeline extension suite
(BASELINE.json north star; beyond the reference's own surface).

Five families, all expressed as relational DataFrame plans (no UDFs in
the hot path — every hash is an md5/conv column expression so the
DuckDB oracle can reproduce values bit-for-bit):

- exact:            content-hash groupBy
- n-gram Jaccard:   shingle inverted index → pair counts → |A∩B|/|A∪B|
- MinHash + LSH:    md5 minhash signatures → banded buckets → candidate
                    pairs → exact-Jaccard verification
- SimHash:          32-bit sign-aggregated token hash, hamming via
                    bit_count(xor), chunk-blocking for candidates
- embedding cosine: blocked (per-label) pairwise cosine

Scale design (100 TB): every candidate generator is a self-equi-join on
a *bucketing key* (shingle, band hash, simhash chunk, label) — shuffle
on that key, never an unkeyed cross join.  Hot buckets are the skew
risk: cap bucket width (``max_bucket``) like production LSH pipelines,
and let AQE split stragglers.  Verification joins carry only
(id, id) + small payloads.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dogsheep_beta_spark.functions.tokenizer import PORTABLE_SPLIT


def tokens_expr(col):
    """Portable tokenizer as a column expression (shared with DuckDB)."""
    return F.filter(F.split(F.lower(F.coalesce(col, F.lit(""))), PORTABLE_SPLIT), lambda x: x != "")


def shingles_expr(tokens, k: int):
    """k-token shingles joined by single spaces (distinct set).

    Guarded for short docs: Spark's sequence(0, n) with n < 0 would
    produce a DESCENDING sequence, so size < k yields [] explicitly.
    """
    if k == 1:
        return F.array_distinct(tokens)
    sh = F.transform(
        F.sequence(F.lit(0), F.size(tokens) - k),
        lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, k)),
    )
    return F.when(F.size(tokens) >= k, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def doc_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(id, shingle) exploded distinct shingle set per document."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(shingles_expr(tokens_expr(F.col(text_col)), k)).alias("shingle"),
        )
        .where(F.col("shingle") != "")
        .distinct()
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Content-hash dedup: one shuffle on md5(text).

    Returns (fingerprint, n_dups, keep_id) per content group — keep_id
    is the smallest id (deterministic survivor pick).
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col).alias("id"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("id").alias("keep_id"))
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, max_bucket: int = 0
) -> DataFrame:
    """All-pairs shingle-set Jaccard via the inverted-index join.

    shared(a,b) = #common shingles from the self-join on shingle;
    |A∪B| = |A| + |B| - shared.  One shuffle on shingle + one on the
    pair key.  ``max_bucket`` drops shingles shared by more than that
    many docs (stop-shingle pruning — at scale a shingle in 10^6 docs
    contributes 10^12 candidate pairs and no information).
    """
    s = doc_shingles(df, id_col, text_col, k)
    if max_bucket:
        hot = s.groupBy("shingle").count().filter(F.col("count") > max_bucket)
        s = s.join(hot.select("shingle"), "shingle", "left_anti")
    sizes = s.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = s.select(F.col("id").alias("a"), "shingle")
    b = s.select(F.col("id").alias("b"), "shingle")
    pairs = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("n", "na"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("n", "nb"), "b")
        .select(
            "a",
            "b",
            (F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))).alias(
                "jaccard"
            ),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _minhash_one(shingles, i: int):
    # NB: the lambda must stay single-parameter — a second (defaulted)
    # parameter makes pyspark pick transform's (element, index) variant
    # and rebind it to the index column.
    prefix = f"{i}|"
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(prefix), s)))
    )


def minhash_signature(shingles, n_hashes: int):
    """Array of md5-based minhashes — h_i(s) = md5(i || '|' || s), min
    as hex string (fixed width ⇒ lexicographic min == numeric min).
    Deterministic and reproducible in any engine with md5."""
    return F.array(*[_minhash_one(shingles, i) for i in range(n_hashes)])


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    n_hashes: int = 16,
    bands: int = 8,
    verify_k: int | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs + exact-Jaccard verification.

    signatures → ``bands`` buckets of ``n_hashes/bands`` rows; docs
    colliding in ANY band become candidates (one self-join on the band
    value); candidates are verified with exact shingle Jaccard.

    At 100 TB this is THE scalable near-dup plan: signature build is a
    map-only pass, banding shuffles once on (band_id, band_hash), and
    only candidates (≪ n²) reach verification.
    """
    r = n_hashes // bands
    # shingle-less docs would all collide on an all-NULL bucket → drop.
    pre = df.select(
        F.col(id_col).alias("id"),
        shingles_expr(tokens_expr(F.col(text_col)), k).alias("shingles"),
    ).where(F.size("shingles") > 0)
    sigs = pre.select(
        "id", minhash_signature(F.col("shingles"), n_hashes).alias("sig")
    )
    # one projection computes every band bucket, posexplode fans out —
    # the signature pipeline (n_hashes × md5 over all shingles) runs
    # exactly once per row, not once per band.
    banded = sigs.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws("|", F.slice("sig", bi * r + 1, r))
                    for bi in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    ).persist()
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    # verification restricted to the candidate doc set — this is the
    # point of LSH at scale: exact Jaccard touches ≪ n² docs.
    cand_ids = (
        cand.select(F.col("a").alias("id"))
        .unionByName(cand.select(F.col("b").alias("id")))
        .distinct()
    )
    cand_docs = df.join(
        cand_ids, df[id_col] == cand_ids["id"], "left_semi"
    )
    exact = jaccard_pairs(cand_docs, id_col, text_col, verify_k or k)
    return cand.join(exact, ["a", "b"], "inner")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash32_expr(tokens):
    """32-bit SimHash over the token multiset.

    token hash = first 8 hex chars of md5 as a 32-bit int (conv→long),
    computed ONCE per token; bit b of the simhash = sign of
    Σ_tokens (±1 by token bit b).  Pure JVM expressions, and the same
    arithmetic is expressible in DuckDB for the oracle.
    """
    hashes = F.transform(
        tokens, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    def bit_vote(b: int):
        # bitwiseAND with a mask literal instead of shiftright (whose
        # python wrapper mishandles lambda-variable columns), and a
        # strictly two-parameter merge lambda (see _minhash_one note).
        mask = F.lit(1 << b)
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )

    bits = [
        F.when(bit_vote(b) > 0, F.lit(2 ** b)).otherwise(F.lit(0)) for b in range(32)
    ]
    return reduce(lambda x, y: x + y, bits).cast("long")


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 6, chunks: int = 4
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance.

    Candidate generation: split the 32-bit hash into ``chunks`` 8-bit
    chunks; pairs within hamming ≤ chunks-1 of each other must agree on
    ≥1 chunk (pigeonhole), so a self-join per chunk value finds them.
    Verification: bit_count(a XOR b) ≤ max_hamming.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        simhash32_expr(tokens_expr(F.col(text_col))).alias("simhash"),
    )
    width = 32 // chunks
    chunked = reduce(
        lambda x, y: x.unionByName(y),
        [
            sh.select(
                "id",
                "simhash",
                F.lit(c).alias("chunk"),
                F.shiftright("simhash", c * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("ckey"),
            )
            for c in range(chunks)
        ],
    )
    cand = (
        chunked.alias("x")
        .join(chunked.alias("y"), ["chunk", "ckey"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("a"),
            F.col("y.id").alias("b"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def cosine_expr(va, vb):
    """Cosine similarity of two array<float> columns — zip_with dot
    product + aggregate norms, all JVM-side."""
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    na = F.sqrt(
        F.aggregate(F.transform(va, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    nb = F.sqrt(
        F.aggregate(F.transform(vb, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    return dot / (na * nb)


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    min_cosine: float = 0.0,
) -> DataFrame:
    """Blocked pairwise cosine: self-join on the blocking key (label /
    LSH bucket / IVF cell), cosine on the pairs, threshold filter.
    The blocking key is what makes this O(Σ block²) instead of O(n²)."""
    e = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
    )
    pairs = (
        e.alias("x")
        .join(e.alias("y"), "block")
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("a"),
            F.col("y.id").alias("b"),
            cosine_expr(
                F.col("x.v").cast("array<double>"), F.col("y.v").cast("array<double>")
            ).alias("cosine"),
        )
    )
    if min_cosine > 0:
        pairs = pairs.where(F.col("cosine") >= min_cosine)
    return pairs
