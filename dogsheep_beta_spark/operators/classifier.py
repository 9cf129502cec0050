"""Trainable quality classifier — hashed-feature LINEAR PROBE fitted
by integer-exact gradient-descent supersteps.

The production pattern (CCNet, RefinedWeb, fastText quality filters):
train a cheap linear classifier on weak labels and score the whole
crawl with it, because the heuristic that produced the labels is too
slow / too hand-tuned to run as the production filter — and because a
trained scorer generalizes across the feature space where the
heuristic only fires on its hand-picked signals.  Here the weak label
is the engine's own ``quality_score >= 0.5`` (self-contained, fully
SQL-expressible), features are a hashed bag of words (the DSIR hashing
trick, ``dim`` buckets), and training is plain batch gradient descent
on squared-ish logistic loss — T supersteps, each ONE margin
aggregation + ONE gradient aggregation over the sparse (id, bucket,
cnt) table, with a bounded ``dim``-row collect per step (the
temperature_rates / BPE-argmax justified-driver-side class).

Why INTEGER-exact: distributed float summation is order-dependent
(Spark's partial aggregates vs any sequential engine), so a float GD
would drift engines apart within one superstep and hash-flake forever.
Instead every per-doc residual is QUANTIZED to integer micro-units
(floor(r·1e6 + 0.5)) before it enters a sum, weights live as integer
micro-weights, and margins are exact integer dot products — the
quantized-Gram discipline applied to model fitting.  The only float
ops are per-scalar (one division by 1e6, the rational sigmoid, one
floor), each a single correctly-rounded IEEE op identical in Spark,
DuckDB and Python, so the trained weights are bit-identical in all
three and the whole train-then-score pipeline strict-hashes against an
unrolled-CTE oracle.

The sigmoid is the RATIONAL approximation s(m) = 0.5 + m/(2(1+|m|))
(monotone, s(0)=0.5, saturating) rather than 1/(1+exp(-m)): ``exp``'s
last-ulp behavior is libm-specific, division and abs are not.  For a
quality filter the exact link-function shape is irrelevant; monotone
calibration is what matters.

Scale: the corpus tokenizes once into the sparse feature table; each
superstep shuffles (a) one groupBy(id) margin aggregate and (b) one
groupBy(bucket) gradient aggregate — both partial-aggregated, both
linear in corpus nonzeros, nothing ever densifies.  Scoring is one
map-side ``element_at`` against the literal weight array plus the
same margin aggregate.  Reference: this engine's operator surface has
no counterpart in dogsheep-beta (extension family per the task brief).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000  # residuals/margins in 1e-6 units — exact in BIGINT
MILLI = 1_000      # features/weights in 1e-3 units (their product: micro)
N_AUX = 5          # structural aux features appended by hashed_features


def total_dim(hash_dim: int) -> int:
    """Length of the weight vector that matches
    ``hashed_features(dim=hash_dim)`` — the hash buckets plus the
    ``N_AUX`` structural aux slots at ``hash_dim..hash_dim+N_AUX-1``.
    Public so callers never have to remember the ``+5``."""
    return hash_dim + N_AUX


def hashed_features(
    df: DataFrame, id_col: str, text_col: str, dim: int = 64,
    salt: str = "qp:",
) -> DataFrame:
    """(id, bucket, x_q): hashed bag-of-words TERM FREQUENCIES,
    quantized to milli-units — x_q = floor(cnt·1000/doc_len + 0.5).
    TF normalization keeps every margin O(max |w|) regardless of
    document length (unnormalized counts saturated the sigmoid and GD
    oscillated); milli quantization keeps the margin dot product
    (milli × milli = micro) exactly representable in BIGINT.  One
    tokenize + one partial-aggregated groupBy; the md5-bridge bucket
    (8 hex chars → exact long arithmetic) keeps hashing
    engine-portable."""
    from dogsheep_beta_spark.operators.dedup import tokens_expr

    t = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_expr(F.col(text_col))).alias("t"),
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), F.col("t"))), 1, 8),
            16,
            10,
        ).cast("long")
        % dim
    ).cast("int")
    counts = (
        t.select("id", bucket.alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    lens = counts.groupBy("id").agg(F.sum("cnt").alias("__len"))
    words = counts.join(lens, "id").select(
        "id",
        "bucket",
        F.floor(
            F.col("cnt") * MILLI / F.col("__len") + F.lit(0.5)
        ).cast("long").alias("x_q"),
    )
    # STRUCTURAL aux features at buckets dim..dim+4 (bias, length band,
    # alpha ratio, word-length band, stopword signal — the quality
    # dimensions fastText-style filters feed their classifier besides
    # the bag of words; a pure-TF probe is length-blind by
    # construction).  Each is a map-side expression quantized to milli
    # like the TFs; token-less docs have no rows at all (featureless →
    # they score at the margin-0 point, see score_corpus_q).
    from dogsheep_beta_spark.functions.text import (
        alpha_ratio,
        avg_token_len,
        stopword_ratio,
    )

    def q3(x):
        return F.floor(x * MILLI + F.lit(0.5)).cast("long")

    wl = avg_token_len(F.col("__text"))
    aux_cols = [
        (dim + 0, F.lit(MILLI).cast("long")),
        (dim + 1, q3(F.least(F.col("__len") / 64.0, F.lit(1.0)))),
        (dim + 2, q3(alpha_ratio(F.col("__text")))),
        (dim + 3, q3(F.when((wl >= 3) & (wl <= 10), 1.0).otherwise(0.5))),
        (dim + 4, q3(F.least(stopword_ratio(F.col("__text")) * 5, F.lit(1.0)))),
    ]
    aux = (
        df.select(
            F.col(id_col).alias("id"), F.col(text_col).alias("__text")
        )
        .join(lens, "id")
        .select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).cast("int").alias("bucket"),
                            x.alias("x_q"),
                        )
                        for b, x in aux_cols
                    ]
                )
            ).alias("f"),
        )
        .select("id", F.col("f.bucket"), F.col("f.x_q"))
    )
    return words.unionByName(aux)


def _sigmoid_q(margin_q):
    """Rational sigmoid of an integer micro-margin, back in micro-units
    as a BIGINT: floor((0.5 + m/(2(1+|m|)))·1e6 + 0.5) with
    m = margin_q/1e6.  Single-rounded IEEE ops only — identical bits in
    Spark, DuckDB and Python."""
    m = margin_q.cast("double") / MICRO
    s = 0.5 + m / (2.0 * (1.0 + F.abs(m)))
    return F.floor(s * MICRO + F.lit(0.5)).cast("long")


def _sigmoid_q_py(margin_q: int) -> int:
    m = margin_q / MICRO
    s = 0.5 + m / (2.0 * (1.0 + abs(m)))
    return math.floor(s * MICRO + 0.5)


def margins_q(feat: DataFrame, weights_q: list[int]) -> DataFrame:
    """(id, margin_q): exact integer dot product of each doc's sparse
    milli-TFs against the literal milli-weight array (product: micro
    units) — map-side lookup + one partial-aggregated groupBy(id), no
    join.  A bucket beyond the weight array raises LOUDLY (with or
    without ANSI mode) instead of silently contributing NULL — the
    failure mode of pairing ``hashed_features(dim=D)`` with a weight
    vector shorter than ``total_dim(D)``."""
    w = F.array(*[F.lit(int(x)).cast("long") for x in weights_q])
    lookup = F.when(
        F.col("bucket") < F.lit(len(weights_q)),
        F.element_at(w, F.col("bucket") + 1),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"margins_q: feature bucket out of range for the "
                    f"{len(weights_q)}-weight vector (did you size "
                    f"weights with total_dim(hash_dim)?): bucket="
                ),
                F.col("bucket").cast("string"),
            )
        ).cast("long")
    )
    return (
        feat.withColumn("__w", lookup)
        .groupBy("id")
        .agg(F.sum(F.col("x_q") * F.col("__w")).alias("margin_q"))
    )


def train_linear_probe(
    feat: DataFrame,
    labels: DataFrame,
    dim: int = 64,
    iters: int = 2,
    eta: int = 8,
) -> list[int]:
    """Fit milli-weights by ``iters`` GD supersteps from w = 0.

    ``dim`` is the HASH dimension passed to ``hashed_features`` — the
    returned weight vector has length ``total_dim(dim)`` so the aux
    buckets at ``dim..dim+N_AUX-1`` (bias, length band, alpha ratio,
    word-length band, stopword signal) get trained slots too.  Before
    round 8 the caller had to remember to pass ``dim + 5`` here or the
    aux features silently looked up NULL weights (ADVICE r7 medium).

    ``labels`` is (id, y) with y ∈ {0, 1}.  Per step: residual micro
    r_q = y·1e6 − s_q(margin) per doc; gradient g[b] = Σ x_q·r_q (an
    EXACT integer sum — order-independent, the whole reason the
    pipeline is quantized); Δw_milli[b] = floor(η·g[b] / (N·1e6))
    folded on the driver (dim rows — the temperature_rates bounded
    class).  One float op per fold entry (a single correctly-rounded
    division + floor), identical in Python and SQL, so the returned
    weights are cross-engine reproducible bit for bit."""
    n_w = total_dim(dim)
    n_docs = labels.count()
    if n_docs == 0:
        return [0] * n_w
    w = [0] * n_w
    denom = float(n_docs) * MICRO
    for _ in range(iters):
        m = margins_q(feat, w)
        # residual entirely in integer micro-units: r_q = y·1e6 − s_q
        # (docs with no features sit at margin 0, s_q = 500000)
        resid = labels.join(m, "id", "left").select(
            "id",
            (
                F.col("y").cast("long") * MICRO
                - _sigmoid_q(F.coalesce(F.col("margin_q"), F.lit(0)))
            ).alias("r_q"),
        )
        grad = {
            r["bucket"]: r["g"]
            for r in feat.join(resid, "id")
            .groupBy("bucket")
            .agg(F.sum(F.col("x_q") * F.col("r_q")).alias("g"))
            .collect()
        }
        w = [
            w[b] + math.floor(eta * grad.get(b, 0) / denom)
            for b in range(n_w)
        ]
    return w


def score_corpus_q(feat: DataFrame, weights_q: list[int]) -> DataFrame:
    """(id, score_q): trained-probe quality score in micro-units —
    the production filter column.  Docs with NO features (empty text)
    score at the margin-0 point, s(0) = 0.5, like every doc did at
    initialization — callers must LEFT-join this onto the corpus and
    coalesce to 500000 for such docs (the declared query does)."""
    return margins_q(feat, weights_q).select(
        "id", _sigmoid_q(F.col("margin_q")).alias("score_q")
    )
