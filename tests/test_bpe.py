"""Distributed BPE merge learning (operators/bpe.py) vs a brute-force
in-memory reference implementation."""

import pytest
from pyspark.sql import functions as F

from dogsheep_beta_spark.operators.bpe import (
    apply_merge,
    learn_bpe,
    pair_counts,
    words_to_symbols,
)


def _ref_bpe(word_counts, n_merges):
    """Plain-Python BPE: char init, leftmost-greedy merge, tie-break
    (count desc, a asc, b asc)."""
    words = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, c in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, cnt))
        out = {}
        for syms, c in words.items():
            new, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            out[tuple(new)] = out.get(tuple(new), 0) + c
        words = out
    return merges, words


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_learn_bpe_matches_reference(spark):
    df = spark.createDataFrame(
        list(SENNRICH.items()), "word string, n long"
    )
    merges, final = learn_bpe(df, "word", "n", n_merges=4)
    ref_merges, ref_words = _ref_bpe(SENNRICH, 4)
    assert merges == ref_merges
    got = {
        tuple(r.sym[1:-1].split("][")): r.n for r in final.collect()
    }
    assert got == ref_words


def test_leftmost_greedy_merge_semantics(spark):
    df = spark.createDataFrame([("aaa", 1)], "word string, n long")
    syms = words_to_symbols(df, "word", "n")
    merged = apply_merge(syms, "a", "a")
    assert merged.collect()[0].sym == "[aa][a]"  # not [a][aa]


def test_pair_counts_weighted_and_tiebreak(spark):
    df = spark.createDataFrame(
        [("ab", 3), ("ba", 3)], "word string, n long"
    )
    pc = {
        (r.a, r.b): r.cnt
        for r in pair_counts(words_to_symbols(df, "word", "n")).collect()
    }
    assert pc == {("a", "b"): 3, ("b", "a"): 3}
    merges, _final = learn_bpe(df, "word", "n", n_merges=1)
    assert merges == [("a", "b", 3)]  # tie broken by pair asc


def test_single_char_words_no_pairs(spark):
    df = spark.createDataFrame([("a", 9), ("b", 4)], "word string, n long")
    merges, _final = learn_bpe(df, "word", "n", n_merges=2)
    assert merges == []


def test_pair_counts_plan_partial_agg(spark):
    """The pair aggregation partial-aggregates map-side: two
    HashAggregates around one Exchange, explode below them."""
    df = spark.createDataFrame(
        [(f"word{i}", i) for i in range(100)], "word string, n long"
    )
    plan = (
        pair_counts(words_to_symbols(df, "word", "n"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("HashAggregate") >= 2
    assert "Generate" in plan  # the explode


def test_bpe_encode_matches_reference_encoder(spark):
    """bpe_encode == the canonical per-word BPE encoder (apply merges
    in rank order, leftmost-greedy) on every doc, including the empty
    doc (n_bpe = 0) — and keep_tokens returns the actual subwords."""
    from dogsheep_beta_spark.operators.bpe import bpe_encode, learn_bpe
    from dogsheep_beta_spark.operators.dedup import tokens_expr

    docs = spark.createDataFrame(
        [
            (1, "low lower lowest low low"),
            (2, "new newer newest new"),
            (3, ""),
            (4, "unseen zzz"),
        ],
        "doc_id long, text string",
    )
    words = (
        docs.select(F.explode(tokens_expr(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    merges, _ = learn_bpe(words, "word", "n", n_merges=4)

    def ref_encode(word):
        syms = list(word)
        for a, b, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    import re

    got = {
        r["id"]: (r["n_bpe"], r["bpe_tokens"])
        for r in bpe_encode(
            docs, "doc_id", "text", merges, keep_tokens=True
        ).collect()
    }
    for did, text in docs.collect():
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        want = [s for w in toks for s in ref_encode(w)]
        assert got[did] == (len(want), want), (did, got[did], want)


def test_bpe_encode_reproduces_training_symbol_table(spark):
    """One-pass-per-rank contract: encoding the training corpus's own
    distinct words reproduces learn_bpe's final symbol table exactly
    (token count per word == bracketed-symbol count of final_symbols)."""
    from dogsheep_beta_spark.operators.bpe import bpe_encode, learn_bpe

    words = spark.createDataFrame(
        [("banana", 5), ("bandana", 3), ("ananas", 2), ("nab", 7)],
        "word string, n long",
    )
    merges, final_syms = learn_bpe(words, "word", "n", n_merges=5)
    want = {
        r["sym"]: r["sym"].count("[") for r in final_syms.collect()
    }
    enc = bpe_encode(
        words.withColumnRenamed("word", "text").withColumn(
            "wid", F.monotonically_increasing_id()
        ),
        "wid",
        "text",
        merges,
        keep_tokens=True,
    )
    got = {
        "[" + "][".join(r["bpe_tokens"]) + "]": r["n_bpe"]
        for r in enc.collect()
    }
    assert got == want, (got, want)


def test_bpe_encode_is_map_only(spark):
    """The compiled replace chain must ride the scan: no Exchange, no
    Python UDF anywhere in the encoder's plan."""
    from dogsheep_beta_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    plan = (
        bpe_encode(docs, "doc_id", "text", [("a", "b", 1)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_exact_token_packing_with_bpe_counts(spark):
    """The encoder's exact counts drive pack_greedy: bins respect the
    REAL tokenizer capacity, not the whitespace estimate (a doc whose
    subword count exceeds its whitespace count must be packed by the
    former)."""
    from dogsheep_beta_spark.operators.bpe import bpe_encode
    from dogsheep_beta_spark.operators.packing import pack_greedy

    # no merges learned => every char is a token: 'abcdef' is 6 BPE
    # tokens but 1 whitespace token
    docs = spark.createDataFrame(
        [(i, "abcdef") for i in range(4)], "doc_id long, text string"
    )
    enc = bpe_encode(docs, "doc_id", "text", merges=[])
    packed = pack_greedy(
        enc.withColumn("shard", F.lit("s")),
        "id",
        "n_bpe",
        capacity=12,
        shard_col="shard",
    )
    rows = packed.collect()
    assert {r["n_tok"] for r in rows} == {6}
    # 4 docs x 6 tokens at capacity 12 -> exactly 2 per bin
    by_bin = {}
    for r in rows:
        by_bin.setdefault(r["bin"], []).append(r["id"])
    assert sorted(len(v) for v in by_bin.values()) == [2, 2]


def test_keep_cols_pass_through_map_side(spark):
    """bpe_encode(keep_cols=...) carries the pack shard key through the
    map-side projection — no join, no exchange — so the declared
    pack_bpe_exact query's only shuffle is pack_greedy's shard
    groupBy."""
    from dogsheep_beta_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(1, "aa bb", "s1"), (2, "cc", "s2")],
        "doc_id long, text string, source string",
    )
    enc = bpe_encode(docs, "doc_id", "text", merges=[], keep_cols=("source",))
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    got = {(r["id"], r["source"], r["n_bpe"]) for r in enc.collect()}
    assert got == {(1, "s1", 4), (2, "s2", 2)}
