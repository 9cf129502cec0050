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
