"""Text-analysis functions for the documents pipeline (north-star
extension): language ID, quality scoring, token counting, document
fingerprinting.  All pure column expressions (JVM-side, oracle-checkable);
no UDFs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from dogsheep_beta_spark.operators.dedup import tokens_expr

# Tiny per-language stopword sets for the n-gram/stopword heuristic.
# Deliberately small and inlined: the langid heuristic must be
# reproducible as a SQL expression in any engine.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "que", "en", "un", "es", "por"],
}


def ws_token_count(col: Column) -> Column:
    """Whitespace token count (the cheap 'how many words' measure)."""
    trimmed = F.trim(F.coalesce(col, F.lit("")))
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def est_bpe_tokens(col: Column) -> Column:
    """BPE-ish token estimate: ceil(chars / 4) — the standard ~4 chars
    per BPE token heuristic, good enough for budget accounting."""
    return F.ceil(F.length(F.coalesce(col, F.lit(""))) / 4.0).cast("long")


def avg_token_len(col: Column) -> Column:
    toks = tokens_expr(col)
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
        / F.size(toks)
    )


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    toks = tokens_expr(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        n_sw.cast("double") / F.size(toks)
    )


def alpha_ratio(col: Column) -> Column:
    """Share of characters that are a-z (after lowering)."""
    s = F.lower(F.coalesce(col, F.lit("")))
    n = F.length(s)
    n_alpha = F.length(F.regexp_replace(s, "[^a-z]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(n_alpha.cast("double") / n)


def quality_score(col: Column) -> Column:
    """Composite quality heuristic in [0, ~1]: length band + alpha
    ratio + word-length sanity + stopword presence.  Weights are
    arbitrary-but-fixed; what matters is determinism + monotonicity."""
    n_tok = ws_token_count(col)
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    wl = avg_token_len(col)
    wl_score = F.when((wl >= 3) & (wl <= 10), 1.0).otherwise(0.5)
    return F.round(
        0.4 * len_score + 0.3 * alpha_ratio(col) + 0.2 * wl_score
        + 0.1 * F.least(stopword_ratio(col) * 5, F.lit(1.0)),
        6,
    )


def langid(col: Column) -> Column:
    """Stopword-overlap language ID over STOPWORDS; ties and
    zero-evidence fall back to 'und' (undetermined)."""
    toks = tokens_expr(col)
    scores = {}
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        scores[lang] = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    best = reduce(F.greatest, scores.values())
    expr = F.lit("und")
    # reversed so earlier languages win exact ties (deterministic order)
    for lang in reversed(list(STOPWORDS)):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def highlight_expr(
    col: Column, terms: list[str], open_tag: str = "<b>", close_tag: str = "</b>"
) -> Column:
    """FTS5 ``highlight()`` analog (SQLite auxiliary function; the
    reference delegates rendering to templates instead, so this is an
    extension): wrap every whole-token occurrence of any query term,
    case-insensitively.  Pure regexp_replace — JVM-side and expressible
    identically in the DuckDB oracle ((?i) + \\b are common to Java
    regex and RE2)."""
    import re as _re

    pattern = r"(?i)\b(" + "|".join(_re.escape(t) for t in terms) + r")\b"
    return F.regexp_replace(
        F.coalesce(col, F.lit("")), pattern, f"{open_tag}$1{close_tag}"
    )


def snippet_expr(
    col: Column, terms: list[str], length: int = 160, **kw
) -> Column:
    """FTS5 ``snippet()`` analog: highlighted text truncated to
    ``length`` chars (deterministic truncation, not match-centered —
    match-centering needs per-row offsets, which the postings table
    provides if needed)."""
    return F.substring(highlight_expr(col, terms, **kw), 1, length)


def char_shingle_fingerprint(col: Column, k: int = 8, n_mins: int = 4) -> Column:
    """Winnowing-style fingerprint: md5 over every k-char window of the
    normalized text, keep the ``n_mins`` smallest hashes, concatenate.
    Robust to local edits (unlike a whole-document hash)."""
    norm = F.regexp_replace(F.lower(F.coalesce(col, F.lit(""))), r"\s+", " ")
    return F.concat_ws(
        "",
        F.slice(
            F.array_sort(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1))),
                    lambda i: F.md5(norm.substr(i, F.lit(k))),
                )
            ),
            1,
            n_mins,
        ),
    )


def fingerprint_table(
    df, id_col: str, text_col: str, k: int = 8, n_mins: int = 4
):
    """(id, fingerprint) via explode + aggregation — same values as
    ``char_shingle_fingerprint`` but with the md5 evaluated as a
    codegen'd column over window rows and the min-``n_mins`` selection
    done by hash aggregation (map-side partials), instead of an
    interpreted per-row lambda over an array.  Preferred at scale."""
    norm = F.regexp_replace(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " "
    )
    wins = df.select(
        F.col(id_col).alias("id"),
        norm.alias("norm"),
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1)))
        ).alias("i"),
    ).select("id", F.md5(F.expr(f"substr(norm, i, {k})")).alias("h"))
    return wins.groupBy("id").agg(
        F.concat_ws("", F.slice(F.array_sort(F.collect_list("h")), 1, n_mins)).alias(
            "fingerprint"
        )
    )


def unigram_nll_table(df, id_col: str, text_col: str):
    """(id, n_tok, nll) — average unigram negative log-likelihood per
    document under the corpus's own unigram LM: the cheap stand-in for
    the perplexity filter public cleaning pipelines (CCNet-style) run
    with a real LM.  Documents made of globally-rare tokens score high
    (gibberish, OCR noise); stopword soup scores low.

    Plan: one token explode feeds BOTH the corpus unigram counts and
    the per-doc aggregation — the exploded table is persisted so the
    corpus is tokenized once.  Count join is on the token (the unigram
    vocabulary does NOT broadcast at 100 TB — a token-keyed shuffle
    join is the honest plan; AQE handles the zipf head skew, and the
    head could be salted with operators/skew.py if needed).  All
    arithmetic is ln() on exact counts, reproducible in any engine.
    """
    tok = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.filter(
                    F.split(
                        F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                        r"[^a-z0-9]+",
                    ),
                    lambda x: x != "",
                )
            ).alias("t"),
        )
        .persist()
    )
    counts = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    total = tok.count()  # one scalar job over the persisted explode
    scored = (
        tok.join(counts, "t")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.round(
                F.avg(-F.log(F.col("c") / F.lit(float(total)))), 6
            ).alias("nll"),
        )
    )
    return scored
