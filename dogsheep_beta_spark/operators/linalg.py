"""Distributed dense linear algebra over embedding columns.

The missing primitive under PCA, whitening, and linear-probe
workflows is the Gram matrix G = Xᵀ X over an N×d embedding table:
d is small (here 64), N is the corpus.  The correct 100 TB shape is
a PARTIAL GEMM per partition — each task multiplies its own rows
into a d×d accumulator with BLAS and emits d(d+1)/2 upper-triangle
cells — followed by a tiny groupBy-sum whose key space is d², so the
shuffle carries ≤ d² rows per partition no matter how many input
rows there are (the classic map-side-combine pattern, here with
numpy doing the inner loop instead of a row-at-a-time aggregate).

Determinism: float summation order varies across engines and
partitionings, so the embeddings are QUANTIZED first —
q = floor(x·scale + 0.5) as int64 — and the Gram is computed in
exact integer arithmetic.  Every engine that quantizes the same way
produces the identical matrix, which makes the result oracle-able
bit-for-bit and run-to-run stable regardless of partitioning.
floor(x+0.5) (not banker's rounding) because floor is identical in
numpy, Spark, and DuckDB, while round() half-tie rules differ.

Overflow bound: |q| ≤ Q ⇒ |Σ q_i q_j| ≤ N·Q².  With Q = 5·scale =
5000 the int64 limit allows N ≈ 3.7e11 rows per matrix — beyond
that, shard the corpus and add the per-shard Grams (they are
addition-mergeable, same as the CMS sketch).

Python appears only inside ``mapInPandas`` on Arrow batches (numpy
GEMM — the vectorized slow-path exception the brief allows); no
row-at-a-time UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantized_gram(
    df: DataFrame, vec_col: str, dim: int, scale: int = 1000
) -> DataFrame:
    """Upper-triangle exact Gram matrix of the quantized embeddings:
    one row per (i, j) with 1 ≤ i ≤ j ≤ dim and
    ``gram = Σ_rows q_i·q_j``, q = floor(x·scale + 0.5) as int64.

    Rows whose vector is NULL or not exactly ``dim`` long are skipped
    (counted nowhere — callers validate upstream if that matters).
    Plan: mapInPandas partial GEMM (emits ≤ d(d+1)/2 rows per
    PARTITION) → groupBy (i, j) sum ← the only exchange, bounded by
    d² regardless of N."""
    import numpy as np
    import pandas as pd

    idx_u, idx_v = np.triu_indices(dim)
    i_out = (idx_u + 1).astype("int32")
    j_out = (idx_v + 1).astype("int32")

    def partial_gram(batches):
        acc = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for pdf in batches:
            vecs = [
                v
                for v in pdf[vec_col]
                if v is not None and len(v) == dim
            ]
            if not vecs:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in vecs]
            )
            # non-finite rows are SKIPPED like NULL/wrong-dim vectors:
            # floor(NaN·scale).astype(int64) is undefined (typically
            # INT64_MIN) and one such row would silently poison the
            # exact Gram (ADVICE r6)
            finite = np.isfinite(x).all(axis=1)
            if not finite.all():
                x = x[finite]
                if x.shape[0] == 0:
                    continue
            q = np.floor(x * scale + 0.5).astype(np.int64)
            acc += q.T @ q
            seen = True
        if seen:
            yield pd.DataFrame(
                {"i": i_out, "j": j_out, "partial": acc[idx_u, idx_v]}
            )

    partials = df.select(vec_col).mapInPandas(
        partial_gram, schema="i int, j int, partial long"
    )
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("partial").alias("gram"))
        .orderBy("i", "j")
    )


def top_eigenvector(gram_rows, dim: int, iters: int = 50) -> list[float]:
    """Driver-side power iteration on a COLLECTED d×d Gram (d is
    small by construction — the distributed part is quantized_gram).
    Returns the dominant eigenvector with a deterministic sign
    convention (first nonzero component positive).  Library helper
    for PCA pipelines; not a declared query (eigensolves have no SQL
    twin)."""
    import numpy as np

    g = np.zeros((dim, dim), dtype=np.float64)
    for r in gram_rows:
        g[r["i"] - 1, r["j"] - 1] = r["gram"]
        g[r["j"] - 1, r["i"] - 1] = r["gram"]
    v = np.ones(dim) / np.sqrt(dim)
    for _ in range(iters):
        w = g @ v
        n = np.linalg.norm(w)
        if n == 0:
            return v.tolist()
        v = w / n
    nz = np.nonzero(np.abs(v) > 1e-12)[0]
    if len(nz) and v[nz[0]] < 0:
        v = -v
    return v.tolist()
