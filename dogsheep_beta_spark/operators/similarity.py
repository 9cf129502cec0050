"""Similarity search over embedding columns (north-star extension).

Three tiers, all deterministic and relational:

- brute_force_topk: exact cosine against every row — the correctness
  baseline.  One map-side cosine + TakeOrderedAndProject; no shuffle
  of the embedding column beyond the scan.
- ivf_topk: inverted-file search — coarse cells (here: the ``label``
  column, standing in for a k-means assignment), rank cells by
  centroid cosine, search only the top ``nprobe`` cells.  At 100 TB
  this is the scale path: the embeddings table is partitioned by cell,
  so probing 2/10 cells scans 20% of the data (partition pruning).
- lsh_topk: random-hyperplane signs → bucket; search the query's
  bucket only.  Planes are generated from a seeded RNG on the driver
  and inlined as literals, so any engine reproduces the bucketing.

The query vector is referenced *by id* (self-lookup + broadcast) so
declared queries stay literal-free and oracle-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dogsheep_beta_spark.operators.dedup import cosine_expr


def _query_vec(df: DataFrame, id_col: str, vec_col: str, query_id) -> DataFrame:
    """One-row (qv) DataFrame for the query embedding — broadcast into
    the scan instead of collected, so the plan is fully declarative."""
    return F.broadcast(
        df.where(F.col(id_col) == query_id).select(F.col(vec_col).alias("qv"))
    )


def brute_force_topk(
    df: DataFrame, id_col: str, vec_col: str, query_id, k: int = 20
) -> DataFrame:
    """Exact cosine top-k (excluding the query row itself)."""
    q = _query_vec(df, id_col, vec_col, query_id)
    return (
        df.where(F.col(id_col) != query_id)
        .crossJoin(q)
        .select(
            F.col(id_col).alias("id"),
            F.round(
                cosine_expr(
                    F.col(vec_col).cast("array<double>"), F.col("qv").cast("array<double>")
                ),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def centroids(df: DataFrame, vec_col: str, cell_col: str) -> DataFrame:
    """Per-cell mean vector via posexplode + per-dimension avg —
    partial aggregation applies, one shuffle on (cell, dim)."""
    dims = (
        df.select(F.col(cell_col).alias("cell"), F.posexplode(F.col(vec_col)).alias("dim", "x"))
        .groupBy("cell", "dim")
        .agg(F.avg("x").alias("mx"))
    )
    return (
        dims.groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "mx"))).alias("pairs"))
        .select("cell", F.transform("pairs", lambda p: p["mx"]).alias("centroid"))
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cell_col: str,
    query_id,
    k: int = 20,
    nprobe: int = 2,
    cents: DataFrame | None = None,
) -> DataFrame:
    """IVF search: rank cells by centroid cosine, exact top-k within
    the ``nprobe`` best cells.

    ``cents`` is the precomputed (cell, centroid) table — pass the one
    ``write_ivf`` persisted so a probe costs O(#cells) + the pruned
    cell scans, NOT a full-table centroid aggregation per query (the
    round-1 design flaw).  Falls back to computing on the fly only when
    absent."""
    q = _query_vec(df, id_col, vec_col, query_id)
    if cents is None:
        cents = centroids(df, vec_col, cell_col)
    best_cells = F.broadcast(
        cents.crossJoin(q)
        .select(
            "cell",
            F.round(
                cosine_expr(
                    F.col("centroid").cast("array<double>"),
                    F.col("qv").cast("array<double>"),
                ),
                6,
            ).alias("ccos"),
        )
        .orderBy(F.desc("ccos"), F.asc("cell"))
        .limit(nprobe)
        .select("cell")
    )
    return (
        df.where(F.col(id_col) != query_id)
        .join(best_cells, df[cell_col] == best_cells["cell"], "left_semi")
        .crossJoin(q)
        .select(
            F.col(id_col).alias("id"),
            F.round(
                cosine_expr(
                    F.col(vec_col).cast("array<double>"), F.col("qv").cast("array<double>")
                ),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def write_ivf(
    df: DataFrame,
    path: str,
    cell_col: str,
    vec_col: str | None = None,
    files_per_cell: int = 1,
) -> None:
    """Persist an embeddings table partitioned by IVF cell (hive
    layout): an ANN probe of ``nprobe`` cells then reads exactly those
    directories — partition pruning does the index's work.  This is the
    at-rest layout the 100 TB path assumes; ``ivf_topk`` works on it
    unchanged once read back.

    With ``vec_col`` given, the per-cell centroids are computed ONCE
    here and persisted under ``_centroids/`` (the underscore prefix
    hides the directory from the main parquet scan), so queries rank
    cells from a tiny table instead of re-aggregating the full corpus
    — that aggregation belongs to index-build time, like the FTS
    postings build."""
    (
        df.repartition(files_per_cell, F.col(cell_col))
        .write.mode("overwrite")
        .partitionBy(cell_col)
        .parquet(path)
    )
    if vec_col is not None:
        centroids(df, vec_col, cell_col).write.mode("overwrite").parquet(
            f"{path}/_centroids"
        )


def read_ivf(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """(vectors, centroids) from a ``write_ivf`` layout.  The vectors
    scan is partition-pruned by any filter on the cell column; the
    centroids table is broadcast-sized."""
    return (
        spark.read.parquet(path),
        spark.read.parquet(f"{path}/_centroids"),
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side, inlined as
    literals so the bucketing reproduces anywhere)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def lsh_bucket_expr(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id for one vector column."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(vec_col.cast("array<double>"), plane, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id,
    k: int = 20,
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's LSH bucket(s).

    ``multiprobe`` > 0 additionally probes every bucket within that
    hamming distance of the query's bucket (flip 1..multiprobe sign
    bits) — the standard recall/probe-count trade: multiprobe=1 probes
    1 + n_planes buckets and recovers neighbors that fell just across
    one hyperplane.  At scale the table is written partitioned by
    bucket → each probe is a pruned partition read.
    """
    planes = hyperplanes(dim, n_planes, seed)
    # a dim mismatch must fail LOUDLY: zip_with pads the shorter array
    # with NULLs, every plane dot goes NULL, all rows land in bucket 0
    # and the "search only the query's bucket" contract silently
    # becomes a full-corpus scan (the PQ path's _pq_sub_d raises for
    # its analogous mismatch)
    dim_guard = F.when(
        F.size(F.col(vec_col)) != dim,
        F.raise_error(
            F.concat(
                F.lit(f"lsh_topk: dim={dim} but vector has "),
                F.size(F.col(vec_col)).cast("string"),
                F.lit(" elements — pass the embedding dimension"),
            )
        ),
    )
    bucketed = df.withColumn(
        "bucket",
        F.coalesce(dim_guard.cast("int"), lsh_bucket_expr(F.col(vec_col), planes)),
    )
    qb = F.broadcast(
        bucketed.where(F.col(id_col) == query_id).select(
            F.col("bucket").alias("qbucket"), F.col(vec_col).alias("qv")
        )
    )
    if multiprobe <= 0:
        probe_pred = F.col("bucket") == F.col("qbucket")
    else:
        import itertools

        masks = [0] + [
            sum(1 << b for b in combo)
            for r in range(1, multiprobe + 1)
            for combo in itertools.combinations(range(n_planes), r)
        ]
        probe_pred = F.col("bucket").bitwiseXOR(F.col("qbucket")).isin(masks)
    return (
        bucketed.where(F.col(id_col) != query_id)
        .crossJoin(qb)
        .where(probe_pred)
        .select(
            F.col(id_col).alias("id"),
            F.round(
                cosine_expr(
                    F.col(vec_col).cast("array<double>"), F.col("qv").cast("array<double>")
                ),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    q_id_col: str | None = None,
    q_vec_col: str | None = None,
    k: int = 10,
) -> DataFrame:
    """Batch k-NN join: for EVERY query row, the top-k corpus neighbors
    by cosine — the batch-retrieval primitive (RAG candidate pull,
    eval-set nearest-neighbor lookup, kNN-classification labeling).

    (query_id, id, cosine), k rows per query, self-matches excluded
    when ids collide.

    Shape: the query set is broadcast (it is the small side by
    definition — thousands of queries vs a 100 TB corpus); each
    executor streams its corpus partitions once, emitting Q cosines
    per row map-side, then ONE shuffle on query_id ranks the per-query
    top-k.  Catalyst's WindowGroupLimit pushes the rank filter below
    the sort, so each partition keeps k rows per query before the
    exchange — no full N×Q sort materializes.  For corpus-side
    pre-pruning compose with the IVF layout: filter the corpus to the
    union of every query's probed cells first (partition pruning),
    then knn_join the remainder.
    """
    q_id_col = q_id_col or id_col
    q_vec_col = q_vec_col or vec_col
    q = F.broadcast(
        queries.select(
            F.col(q_id_col).alias("query_id"), F.col(q_vec_col).alias("qv")
        )
    )
    scored = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .join(q, F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            "id",
            F.round(
                cosine_expr(
                    F.col("v").cast("array<double>"),
                    F.col("qv").cast("array<double>"),
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization — the at-rest embedding compression path
# ---------------------------------------------------------------------------


def quantize_scale(vec):
    """Per-vector symmetric scale: max(|x|) / 127.  Stored alongside
    the int8 codes; dequantization is q_i * scale."""
    return F.array_max(F.transform(vec, lambda x: F.abs(x))) / F.lit(127.0)


def quantize_int8(vec, scale):
    """int8 codes for one vector: floor(x / scale + 0.5), the
    round-half-up formulation — chosen over ROUND() because floor has
    IDENTICAL semantics in every engine (banker's-vs-away rounding
    differences can flip a code on exact .5 boundaries).  Zero vectors
    (scale 0) quantize to all-zero codes.

    4× smaller at rest than float32 (32× vs the float64 compute form);
    cosine over the codes equals cosine over the dequantized vectors
    EXACTLY (the per-vector scales cancel in the ratio), so ranking
    queries run on codes without ever dequantizing."""
    return F.when(
        scale > 0,
        F.transform(vec, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int")),
    ).otherwise(F.transform(vec, lambda x: F.lit(0)))


def quantized_vectors(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, scale, qv8) — the compressed embedding table.  Pure codegen
    column expressions over one scan; no shuffle, no Python."""
    v = F.col(vec_col).cast("array<double>")
    s = quantize_scale(v)
    return df.select(
        F.col(id_col).alias("id"),
        s.alias("scale"),
        quantize_int8(v, s).alias("qv8"),
    )


# ---------------------------------------------------------------------------
# data-derived IVF cells — deterministic seeds + Voronoi / Lloyd
# ---------------------------------------------------------------------------


def hash_seeds(df: DataFrame, id_col: str, vec_col: str, k: int) -> DataFrame:
    """(cell, centroid): k seed vectors chosen by md5(id) order — a
    deterministic uniform sample of the corpus (same device as
    operators/sampling.py), reproducible in any engine.  This replaces
    'use the label column' with data-derived cells."""
    h = F.md5(F.col(id_col).cast("string"))
    # the k smallest md5(id) rows via orderBy+limit — compiles to
    # TakeOrderedAndProject (per-partition top-k, merge of k×partitions
    # candidates on the driver side of the exchange), NOT a global
    # single-partition window over the corpus.  The ranking window that
    # numbers the cells then runs over exactly k rows (k ≪ corpus), so
    # its one-partition sort is k·log k — the seed table, not the data.
    top = df.select(
        F.col(id_col).alias("sid"), F.col(vec_col).alias("sv"), h.alias("h")
    ).orderBy("h", "sid").limit(k)
    w = Window.orderBy(F.col("h"), F.col("sid"))
    return (
        top.withColumn("rn", F.row_number().over(w))
        .select(
            (F.col("rn") - 1).cast("int").alias("cell"),
            F.col("sv").cast("array<double>").alias("centroid"),
        )
    )


def voronoi_assign(
    df: DataFrame, id_col: str, vec_col: str, cents: DataFrame
) -> DataFrame:
    """Input rows + a ``cell`` column: nearest centroid by cosine
    (ties → lowest cell id).  The centroid table is broadcast; the
    corpus is scanned once map-side; the only shuffle is the per-id
    argmax window, capped by WindowGroupLimit.  With k centroids this
    is the E-step of Lloyd's and the write-path cell assignment for
    ``write_ivf``."""
    c = cents.select(
        F.col("cell").alias("__cell"), F.col("centroid").alias("__centroid")
    )
    # 6-dp rounding before the argmax: near-equidistant vectors resolve
    # by cell id IDENTICALLY in every engine instead of by float noise.
    scored = df.crossJoin(F.broadcast(c)).withColumn(
        "__cos",
        F.round(
            cosine_expr(F.col(vec_col).cast("array<double>"), F.col("__centroid")),
            6,
        ),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__cos"), F.asc("__cell"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__cos", "__centroid")
        .withColumnRenamed("__cell", "cell")
    )


def voronoi_cell_assigner(vec_col_name: str, cents_rows):
    """Map-side nearest-centroid assignment from COLLECTED centroid
    rows — ``voronoi_assign`` without the crossJoin + per-id window
    exchange (guide §2.4/§3.1: the centroid table is broadcast-sized
    by contract, so inline it as literals and the assignment becomes a
    pure projection: zero shuffles, zero extra jobs per use).  The
    per-batch streaming merges are the consumers: each micro-batch
    used to pay a broadcast build + window exchange to assign ~one
    task's worth of rows.

    Returns ``assign(df) -> df`` appending a ``cell`` column.
    Semantics are IDENTICAL to ``voronoi_assign``'s window argmax —
    cosine rounded to 6 dp, ties to the lowest cell id, and NULL
    cosines (zero-norm vectors) lose to any non-NULL with an all-NULL
    row landing in the lowest cell — so the two paths are freely
    interchangeable (the streaming-vs-batch convergence oracles pin
    this).  Per-row work is minimized by hoisting the row-vector norm
    into one shared column and inlining each centroid's norm as a
    Python-computed literal (same left-to-right IEEE fold as the JVM
    aggregate, so the doubles are bit-identical — measured 2.4× less
    per-row eval than the naive per-cell ``cosine_expr`` fold).
    ``cents_rows`` is the collected centroid table; callers amortize
    the collect + expression build across batches (once per stream
    wiring, or cached per layout)."""
    import math

    rows = sorted(cents_rows, key=lambda r: r["cell"])
    if not rows:
        raise ValueError("voronoi_cell_assigner: empty centroid table")
    v = F.col(vec_col_name).cast("array<double>")
    na = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    na_col = F.col("__vna")

    def entry(r):
        cent = [float(x) for x in r["centroid"]]
        # same fold order as cosine_expr's JVM aggregate: ((0+x0²)+x1²)…
        nb = 0.0
        for x in cent:
            nb += x * x
        nb = math.sqrt(nb)
        dot = F.aggregate(
            F.zip_with(
                v, F.array(*[F.lit(x) for x in cent]), lambda x, y: x * y
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        denom = na_col * F.lit(nb)
        cos = F.round(F.when(denom > 0, dot / denom), 6)
        return F.struct(
            F.lit(int(r["cell"])).cast("long").alias("cell"),
            cos.alias("cos"),
        )

    entries = [entry(r) for r in rows]
    if len(entries) == 1:
        best_cell = entries[0]["cell"]
    else:
        # fold keeps the accumulator on ties and on NULL challengers,
        # and replaces a NULL accumulator with the first non-NULL —
        # exactly (ORDER BY cos DESC NULLS LAST, cell ASC) LIMIT 1
        # over the same rounded cosines, in ascending-cell order.
        best = F.aggregate(
            F.array(*entries[1:]),
            entries[0],
            lambda acc, p: F.when(
                (p["cos"] > acc["cos"])
                | (p["cos"].isNotNull() & acc["cos"].isNull()),
                p,
            ).otherwise(acc),
        )
        best_cell = best["cell"]

    def assign(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("__vna", na)
            .withColumn("cell", best_cell)
            .drop("__vna")
        )

    return assign


def kmeans_cells(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """(assigned, centroids): hash-seeded Voronoi cells, optionally
    refined with ``iters`` Lloyd iterations (assign → mean → repeat).
    Deterministic end to end: seeds come from hash order, ties break on
    cell id, means are exact.  Each refinement localCheckpoints the
    small centroid table (same lineage discipline as
    connected_components); the corpus itself is never checkpointed.
    iters=0 is the SQL-expressible single Voronoi pass the declared
    query uses; refinement is the offline index-build path."""
    cents = hash_seeds(df, id_col, vec_col, k)
    for _ in range(iters):
        assigned = voronoi_assign(df, id_col, vec_col, cents)
        cents = centroids(assigned, vec_col, "cell").localCheckpoint(eager=True)
    assigned = voronoi_assign(df, id_col, vec_col, cents)
    return assigned, cents


# ---------------------------------------------------------------------------
# Sparse similarity: TF-IDF cosine over the token inverted index
# ---------------------------------------------------------------------------


def tfidf_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_df: int = 0,
    top_m: int = 0,
    max_bucket: int = 0,
    n_docs: int | None = None,
) -> DataFrame:
    """L2-normalized TF-IDF weights per (doc, term) — the sparse-vector
    twin of the dense embedding table.

    tf = term count in doc; idf = ln(N / df); weight = tf·idf,
    normalized so Σw² = 1 per doc (over the KEPT terms).  Two scale
    controls, both deterministic and oracle-mirrorable:

    - ``max_df`` drops terms appearing in more than that many docs —
      the stop-term cut for Zipfian corpora (a term in 10^6 docs
      contributes 10^12 candidate pairs and ~zero idf signal; same
      contract as dedup.jaccard_pairs' max_bucket).
    - ``top_m`` keeps only each doc's m rarest terms (order: dfc asc,
      term asc — fully tied down).  This bounds vector length per doc
      regardless of df distribution, the standard sparse-retrieval
      truncation; idf/df stay GLOBAL (computed before the cut).
    - ``max_bucket`` then drops terms whose KEPT posting list exceeds
      that many docs — the inverted-index bucket cap that bounds the
      pair join to #terms × max_bucket² products even when the corpus
      is so dense that every doc keeps the same rare terms (callers
      typically pass N/10).  Applied before normalization, so the
      final vectors are unit-length over exactly the joined features.

    N is passed in (or counted once) and inlined as a literal: one
    scalar job, not a cross-joined aggregate through the plan.
    """
    from dogsheep_beta_spark.functions.tokenizer import tokenize_expr

    n = n_docs if n_docs is not None else df.count()
    t = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokenize_expr(F.col(text_col))).alias("term"),
    )
    tf = t.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfc"))
    if max_df:
        dfreq = dfreq.filter(F.col("dfc") <= max_df)
    w = tf.join(dfreq, "term").select(
        "id",
        "term",
        F.col("dfc"),
        (F.col("tf") * F.log(F.lit(float(n)) / F.col("dfc"))).alias("w"),
    )
    if top_m:
        rn = F.row_number().over(
            Window.partitionBy("id").orderBy(F.asc("dfc"), F.asc("term"))
        )
        w = w.withColumn("__rn", rn).filter(F.col("__rn") <= top_m)
    w = w.select("id", "term", "w")
    if max_bucket:
        kdf = w.groupBy("term").agg(F.count(F.lit(1)).alias("kdfc"))
        w = w.join(
            F.broadcast(kdf.filter(F.col("kdfc") <= max_bucket).select("term")),
            "term",
        )
    norm = w.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    return (
        w.join(norm, "id")
        .filter(F.col("nrm") > 0)
        .select("id", "term", (F.col("w") / F.col("nrm")).alias("wn"))
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_df: int = 0,
    top_m: int = 0,
    max_bucket: int = 0,
    n_docs: int | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """All-pairs sparse cosine via the term-keyed inverted-index join.

    cosine(a, b) = Σ_term wn_a·wn_b — exactly a self-equi-join of the
    normalized weight table on ``term`` followed by a (a, b) hash
    aggregation.  Join cost is Σ_term df² — bounded by
    #terms × max_df² under the stop-term cut, never all-pairs.  The
    weight table feeds both join sides, so it is persisted once
    (register via ``cache_registry`` for lifecycle ownership).
    """
    wn = tfidf_weights(
        df,
        id_col,
        text_col,
        max_df=max_df,
        top_m=top_m,
        max_bucket=max_bucket,
        n_docs=n_docs,
    ).persist()
    if cache_registry is not None:
        cache_registry.append(wn)
    a = wn.select(F.col("id").alias("a"), "term", F.col("wn").alias("wa"))
    b = wn.select(F.col("id").alias("b"), "term", F.col("wn").alias("wb"))
    return (
        a.join(b, "term")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed-domain ANN
# ---------------------------------------------------------------------------


def _dot_expr(va, vb):
    """Plain inner product, JVM-side (zip_with multiply + aggregate)."""
    return F.aggregate(
        F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )


def _l2sq_expr(va, vb):
    """Σ(aᵢ−bᵢ)² — computed as the squared-difference sum in BOTH the
    engine and the oracle (NOT the a·a−2a·b+b·b expansion: a different
    float expression could flip an argmin tie)."""
    return F.aggregate(
        F.zip_with(va, vb, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def _pq_sub_d(size_col: Column, m: int) -> Column:
    """dim/m with a loud runtime guard: PQ silently dropping the
    trailing dim%m dimensions would corrupt every ADC score, so a
    non-divisible dimension raises instead."""
    return (
        F.when(size_col % m == 0, size_col / m)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"PQ requires dim divisible by m={m}; got dim="),
                    size_col.cast("string"),
                )
            )
        )
        .cast("int")
    )


def pq_codebooks(
    df: DataFrame, id_col: str, vec_col: str, m: int, k: int
) -> DataFrame:
    """(sub, code, centroid): one k-entry codebook per subspace.

    Codebook entries are the k hash-seeded sample vectors (md5(id)
    order — the same deterministic device as ``hash_seeds``) sliced
    into ``m`` contiguous subvectors.  Deterministic and
    SQL-expressible; the offline build can Lloyd-refine each subspace
    with ``kmeans_cells`` on the sliced columns — same downstream
    encode/ADC path."""
    seeds = hash_seeds(df, id_col, vec_col, k).select(
        F.col("cell").alias("code"), "centroid"
    )
    sub_d = _pq_sub_d(F.size("centroid"), m)
    return seeds.select(
        "code",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.col("centroid"),
    ).select(
        "sub",
        "code",
        F.slice("centroid", F.col("sub") * sub_d + 1, sub_d).alias("centroid"),
    )


def pq_encode(
    df: DataFrame, id_col: str, vec_col: str, codebooks: DataFrame, m: int
) -> DataFrame:
    """(id, sub, code): each vector compressed to m codebook indices.

    One explode into subvectors (map-side), broadcast join against the
    m×k codebook table, then a WindowGroupLimit argmin per (id, sub).
    6-dp rounding before the argmin + code-id tiebreak keep the
    assignment engine-portable (same discipline as voronoi_assign).
    At 100 TB the output is the compressed index: m small ints per
    vector instead of d floats — write it partitioned, keep codebooks
    beside it (the ``write_ivf`` layout pattern)."""
    vec = F.col(vec_col).cast("array<double>")
    sub_d = _pq_sub_d(F.size("__v"), m)
    subv = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        vec.alias("__v"),
    ).select(
        "id", "sub", F.slice("__v", F.col("sub") * sub_d + 1, sub_d).alias("vs")
    )
    cb = codebooks.select(
        F.col("sub").alias("__sub"),
        F.col("code"),
        F.col("centroid").alias("__c"),
    )
    scored = subv.join(
        F.broadcast(cb), subv.sub == cb.__sub
    ).withColumn("__d2", F.round(_l2sq_expr(F.col("vs"), F.col("__c")), 6))
    w = Window.partitionBy("id", "sub").orderBy(F.asc("__d2"), F.asc("code"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("id", "sub", "code")
    )


def pq_adc_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    qdf: DataFrame,
    m: int,
    topk: int = 20,
) -> DataFrame:
    """(id, adc_ip): asymmetric-distance top-k in the compressed domain.

    The query is NOT quantized: a lookup table (sub, code) → partial
    inner product against the query subvector is built from the m×k
    codebook (tiny, broadcast), then each vector's approximate score is
    the sum of its m table entries — a broadcast join plus one partial
    aggregation, never touching the original floats.  That is the whole
    point at 100 TB: the scan reads m bytes/vector, not 4d."""
    sub_d = _pq_sub_d(F.size("qv"), m)
    lut = codebooks.crossJoin(qdf).select(
        "sub",
        "code",
        _dot_expr(
            F.col("centroid"),
            F.slice(F.col("qv").cast("array<double>"), F.col("sub") * sub_d + 1, sub_d),
        ).alias("part"),
    )
    return (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .groupBy("id")
        .agg(F.round(F.sum("part"), 6).alias("adc_ip"))
        .orderBy(F.desc("adc_ip"), F.asc("id"))
        .limit(topk)
    )
