"""Sliding-window document chunking (training-data pipeline extension).

Every LLM pretraining/embedding pipeline slices documents into
fixed-size token windows with overlap (context-window packing inputs,
RAG passage extraction, embedding-model inputs).  This is the
chunker: tokenize once, emit one row per (doc, window) — all inside
whole-stage codegen.

Spark-first shape: ONE pass, zero shuffles, zero Python.

    tokens   = split(lower(text))             -- codegen expression
    n_chunks = 0           if n = 0
               1           if n <= window
               1 + ceil((n - window)/stride)  otherwise
    explode(sequence(0, n_chunks-1))          -- one row per window
    slice(tokens, i*stride + 1, window)       -- the chunk

At 100 TB this is a map-only operator: chunk rows inherit the input's
partitioning, the explode fan-out (~n/stride per doc) is bounded and
local, and nothing crosses the network.  The final chunk is the
shorter tail (no padding) — padding/packing is `operators/packing.py`'s
job downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dogsheep_beta_spark.functions.tokenizer import tokenize_expr


def _n_chunks(n: Column, window: int, stride: int) -> Column:
    # enough windows to reach the end (1 + ceil((n-w)/s)), capped by the
    # number of in-range starts (ceil(n/s)) — without the cap, stride >
    # window emits an empty chunk whose start falls past the last token
    return (
        F.when(n == 0, F.lit(0))
        .when(n <= window, F.lit(1))
        .otherwise(
            F.least(
                1 + F.ceil((n - F.lit(window)).cast("double") / F.lit(stride)),
                F.ceil(n.cast("double") / F.lit(stride)),
            )
        )
        .cast("int")
    )


def sliding_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 64,
    stride: int = 48,
    mode: str = "portable",
) -> DataFrame:
    """(id, chunk_idx, n_tok, chunk_text) — overlapping token windows.

    ``stride < window`` gives overlap (window - stride tokens shared
    between consecutive chunks); ``stride = window`` is disjoint
    chunking.  Zero-token documents produce zero chunks.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = tokenize_expr(F.col(text_col), mode=mode)
    base = df.select(
        F.col(id_col).alias("id"), toks.alias("__toks"), F.size(toks).alias("__n")
    )
    nc = _n_chunks(F.col("__n"), window, stride)
    # guard: sequence(0, -1) auto-reverses to [0, -1] in Spark, so an
    # empty doc must map to an empty array, not a descending sequence
    idx = F.when(nc > 0, F.sequence(F.lit(0), nc - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunks = base.select("id", "__toks", "__n", F.explode(idx).alias("chunk_idx"))
    piece = F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, window)
    return chunks.select(
        "id",
        "chunk_idx",
        F.size(piece).alias("n_tok"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def paragraph_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, para_idx, n_chars, para_text) — structure-based
    segmentation: one row per blank-line-separated paragraph, the
    boundary-preserving complement of the token windows above (RAG
    passage extraction and quality scoring both prefer natural
    boundaries when the document has them).

    Same map-only contract: ``split`` on the ``\\n{2,}`` separator,
    ``filter`` drops whitespace-only fragments, ``posexplode`` emits
    the surviving paragraphs with a 1-based index among the KEPT
    paragraphs — all codegen expressions, zero shuffles, zero Python;
    the fan-out is bounded by the document's own paragraph count.
    Both the separator regex and the keep test (``\\n{2,}`` split,
    contains-``\\S`` match) mean the same thing to Java regex and RE2,
    so the op is exactly oracle-expressible."""
    parts = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n{2,}")
    kept = F.filter(parts, lambda x: x.rlike(r"\S"))
    ex = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(kept).alias("para_pos", "para_text"),
    )
    return ex.select(
        "id",
        (F.col("para_pos") + 1).alias("para_idx"),
        F.length("para_text").alias("n_chars"),
        "para_text",
    )


def strip_boilerplate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
    sep: str = "\n\n",
) -> DataFrame:
    """(id, text_clean, n_paragraphs, n_removed) — boilerplate REMOVAL,
    the deletion verb on top of the paragraph-hash detection pass
    (CCNet / RefinedWeb pipelines: headers, footers, cookie banners,
    license blocks repeat across documents; delete the repeated
    paragraphs, keep the rest in order).

    A paragraph is boilerplate iff its exact content appears in
    >= ``min_docs`` DISTINCT documents (within-document repetition is
    repetition, not boilerplate — that signal lives in
    functions/text.repetition_table).  Every input doc comes back:
    a doc whose every paragraph was boilerplate has text_clean = ''
    (dropping such docs is a sampling decision, left to the caller).

    Scale shape: paragraph split is map-only (paragraph_chunks); the
    frequency pass is ONE partial-aggregated shuffle on the paragraph
    hash; the boilerplate hash set holds only cross-doc-repeated
    paragraphs (tiny next to the corpus) so the hot-mark join
    broadcasts under AQE; then ONE groupBy(id) computes counts and the
    reassembled text together (collect_list drops the NULLs the
    hot-mark when() leaves for removed paragraphs).  No step is
    O(corpus²) — mass-duplicated paragraphs cost one counter row each.
    """
    paras = paragraph_chunks(df, id_col, text_col).withColumn(
        "__h", F.md5("para_text")
    )
    hot = (
        paras.groupBy("__h")
        .agg(F.count_distinct("id").alias("__docs"))
        .where(F.col("__docs") >= min_docs)
        .select("__h", F.lit(1).alias("__hot"))
    )
    marked = paras.join(hot, "__h", "left")
    per_doc = marked.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_paragraphs"),
        F.count("__hot").alias("__n_hot"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__hot").isNull(),
                            F.struct("para_idx", "para_text"),
                        )
                    )
                ),
                lambda s: s["para_text"],
            ),
            sep,
        ).alias("text_clean"),
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("n_paragraphs", F.lit(0)).cast("int").alias(
                "n_paragraphs"
            ),
            F.coalesce("__n_hot", F.lit(0)).cast("int").alias("n_removed"),
        )
    )


def c4_clean(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_line_words: int = 3,
    min_sentences: int = 5,
    keep: list | None = None,
) -> DataFrame:
    """(id, text_clean, n_lines, n_kept, n_sentences, keep_doc) — the
    C4 line-and-page cleaning rules (Raffel et al. 2020,
    arXiv:1910.10683 §2.2), the published recipe behind the C4 corpus:

    line rules (a line survives iff ALL hold):
      - ends in terminal punctuation (``.``, ``!``, ``?``, ``"``);
      - has at least ``min_line_words`` whitespace words;
      - does not contain the phrase ``lorem ipsum`` (case-folded);
      - does not contain the word ``javascript`` (case-folded).
    page rules (``keep_doc``):
      - the ORIGINAL text contains no ``{`` (the code heuristic);
      - the cleaned text has at least ``min_sentences`` sentences
        (terminal-punctuation count over kept lines).

    Every input doc comes back with its cleaned text and a
    ``keep_doc`` verdict — dropping is the caller's sampling decision,
    the same contract as ``strip_boilerplate``.  The paper's remaining
    step (three-sentence-span dedup across pages) is cross-document
    state and lives in the dedup family (``verbatim_overlap_pairs`` /
    ``dedup.paragraphs``).

    Scale shape: one map-side projection over a bound line array — no
    joins, no shuffles, no UDFs; a scan at any corpus size.  ``keep``
    names extra input columns carried through to the output (so a
    per-source report needs no join back to the corpus).

    Line trimming is ASCII-space only (Spark ``trim`` ≡ DuckDB
    ``trim`` — the cross-engine parity contract); a line ending in a
    tab therefore fails the terminal-punctuation rule.  Normalize
    tabs upstream if your corpus carries them.
    """
    s = F.coalesce(F.col(text_col), F.lit(""))
    bound = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in (keep or [])],
        F.split(s, "\n").alias("__ln"),
        (F.instr(s, "{") == 0).alias("__nobrace"),
    )

    def line_ok(x):
        t = F.trim(x)
        low = F.lower(t)
        terminal = (
            t.endswith(".") | t.endswith("!") | t.endswith("?")
            | t.endswith('"')
        )
        words = F.size(F.split(t, r"\s+"))
        return (
            terminal
            & (t != "")
            & (words >= min_line_words)
            & ~low.contains("lorem ipsum")
            & ~low.rlike(r"\bjavascript\b")
        )

    kept = F.filter(F.col("__ln"), line_ok)
    clean = F.array_join(kept, "\n")
    n_sent = (
        F.length(clean)
        - F.length(F.regexp_replace(clean, r"[.!?]", ""))
    )
    out = bound.select(
        "id",
        *[F.col(c) for c in (keep or [])],
        clean.alias("text_clean"),
        F.size("__ln").alias("n_lines"),
        F.size(kept).alias("n_kept"),
        n_sent.alias("n_sentences"),
        (
            F.col("__nobrace") & (n_sent >= min_sentences)
        ).cast("int").alias("keep_doc"),
    )
    return out
