"""Physical-plan regression tests — pin the shapes the engine's 100 TB
story depends on (SURVEY §4, §7.5): pushdown reaching Parquet scans,
top-k compiling to TakeOrderedAndProject, broadcast joins in the
search/hydration path, and every declared query having an oracle."""

import pytest
from pyspark.sql import functions as F

from dogsheep_beta_spark.plans.query import QueryPlan, timeline_query
from dogsheep_beta_spark.sources.registry import register_testdata

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_filter_pushdown_and_pruning(spark):
    register_testdata(spark, SF_DIR, tables=("orders",))
    df = (
        spark.table("orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(o_orderpriority), EqualTo(o_orderpriority,1-URGENT)" in plan
    # column pruning: the scan reads only the 2 referenced columns
    assert "ReadSchema: struct<o_orderkey:bigint,o_orderpriority:string>" in plan


def test_timeline_topk_is_take_ordered(spark, plugin_index):
    plan = _plan(timeline_query(plugin_index, QueryPlan()))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_search_path_has_no_sort_merge_join(spark, plugin_index):
    from dogsheep_beta_spark.operators.fts_index import build_fts_index
    from dogsheep_beta_spark.plans.search import search

    fts = build_fts_index(plugin_index, mode="portable", stem=False)
    df = search(plugin_index, fts, "things")
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan  # scored sets broadcast
    assert "BroadcastHashJoin" in plan


def test_facet_label_join_is_broadcast(spark, plugin_index):
    from dogsheep_beta_spark.operators import facets as facet_ops
    from dogsheep_beta_spark.schema import categories_df

    facet = facet_ops.column_facet(plugin_index, "category")
    labeled = facet_ops.facet_with_labels(facet, categories_df(spark))
    assert "BroadcastHashJoin" in _plan(labeled)


def test_hydrate_join_is_broadcast(spark):
    from dogsheep_beta_spark.plans.hydrate import hydrate_join

    results = spark.createDataFrame([("t", "1")], "type string, key string")
    view = spark.createDataFrame([(1, "x")], "id int, payload string")
    plan = _plan(hydrate_join(results, view, "id"))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 2  # semi-prune + left join


# Queries allowed on the weaker rows-only gate — ONLY for semantics SQL
# genuinely cannot express.  Each entry needs a justification here and a
# value-pinning pytest elsewhere.
NO_ORACLE_ALLOWED = {
    # zlib compression has no SQL twin; determinism pinned by
    # tests/test_extensions.py::test_compression_ratio_table
    "text_compression_ratio",
}


def test_every_declared_query_has_an_oracle():
    import __spark_entry__ as entry

    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    assert oracles <= qs, f"orphan oracles: {oracles - qs}"
    missing = qs - oracles - NO_ORACLE_ALLOWED
    # every query is oracle-checked unless explicitly allowlisted above
    assert not missing, f"queries without oracle: {missing}"
    assert not (NO_ORACLE_ALLOWED & oracles), "allowlisted query grew an oracle"


def test_no_oracle_projects_hugeint():
    """Sweep every declared oracle's FINAL projection (DuckDB DESCRIBE —
    binds the query, executes nothing) and ban HUGEINT/UHUGEINT columns.
    DuckDB sums BIGINT into HUGEINT, and fetchdf() renders HUGEINT as
    float64, so the driver's raw-str hash sees '1435.0' against Spark's
    '1435' — the exact root cause of the round-6/7 `sample_token_budget`
    driver red (the local gate's `.12g` float text collapsed the two and
    the red was misread as a flake).  Any aggregate that can widen must
    CAST(... AS BIGINT) in the oracle."""
    import duckdb

    import __spark_entry__ as entry
    from tools.check_oracle import register_duck_views

    con = duckdb.connect()
    register_duck_views(con, SF_DIR)
    offenders = {}
    for name, sql in entry.oracle_sql().items():
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # a DESCRIBE-time error is its own failure
            offenders[name] = f"describe failed: {e}"
            continue
        bad = [
            (col, typ)
            for col, typ, *_ in desc
            if "HUGEINT" in str(typ).upper()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle final projections with HUGEINT (fetchdf renders these as "
        f"float64 → driver hash red): {offenders}"
    )


def test_dtype_parity_gate_catches_int_vs_float():
    """The local strict gate must be at least as strict as the driver's
    canonicalization: int64-vs-float64 column divergence fails even when
    the values are numerically equal (round-7 VERDICT What's-wrong #1/#2)."""
    import pandas as pd

    from tools.check_oracle import compare_strict, dtype_parity_problems

    a = pd.DataFrame({"k": ["x"], "n": pd.array([1435], dtype="int64")})
    b = pd.DataFrame({"k": ["x"], "n": pd.array([1435.0], dtype="float64")})
    assert dtype_parity_problems(a, b), "int-vs-float divergence not flagged"
    assert compare_strict("t", a, b), "strict gate forgave the divergence"
    # equal dtypes with equal values still pass
    assert not compare_strict("t", a, a.copy())
    # float-vs-float with equal values passes the dtype check
    assert not dtype_parity_problems(b, b.copy())


def test_jaccard_max_bucket_prunes_hot_shingles(spark):
    """The declared n-gram Jaccard query must keep stop-shingle pruning
    wired in: the hot-shingle anti-join is what bounds the inverted-
    index self-join at scale (regression for the round-1 weak spot)."""
    from dogsheep_beta_spark.operators.dedup import jaccard_pairs

    docs = spark.createDataFrame(
        [(i, "a b c d e") for i in range(5)], "doc_id long, text string"
    )
    plan = (
        jaccard_pairs(docs, "doc_id", "text", k=3, max_bucket=2)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "LeftAnti" in plan
    plan0 = (
        jaccard_pairs(docs, "doc_id", "text", k=3)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "LeftAnti" not in plan0

    import inspect

    import __spark_entry__ as entry

    # the SHARED pair builder (feeds ngram_jaccard + cluster_keep +
    # pipeline_clean_corpus) must keep stop-shingle pruning wired in —
    # check the code, not the docstring
    src = inspect.getsource(entry._jaccard_pairs)
    assert 'max_bucket=100' in src.split('"""')[-1]


def test_pack_and_sample_single_shuffle_plans(spark):
    """Scale regressions for the packing/sampling family: contiguous
    packing is ONE exchange on the shard key (the window cumsum adds no
    second shuffle), and stratified sampling keeps the per-stratum rank
    filter below its single exchange (WindowGroupLimit), so the shuffle
    carries candidates, not the corpus."""
    from dogsheep_beta_spark.operators.packing import pack_contiguous
    from dogsheep_beta_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, f"s{i % 3}", i % 100) for i in range(50)],
        "doc_id long, src string, n long",
    )
    pack_plan = (
        pack_contiguous(df, "doc_id", "n", 256, "src")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert pack_plan.count("Exchange") == 1

    sample_plan = (
        stratified_sample(df, "src", "doc_id", 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert sample_plan.count("Exchange") == 1
    assert "WindowGroupLimit" in sample_plan


def test_embedding_gemm_single_shuffle(spark):
    """Blocked GEMM cosine: exactly one exchange (hash on the blocking
    key) feeding the per-block applyInPandas — no pair-join exchange,
    no sort-merge join anywhere."""
    from dogsheep_beta_spark.operators.dedup import embedding_dup_pairs

    df = spark.createDataFrame(
        [(i, [float(i), 1.0], f"b{i % 2}") for i in range(8)],
        "vec_id long, embedding array<double>, label string",
    )
    plan = (
        embedding_dup_pairs(df, "vec_id", "embedding", "label")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "SortMergeJoin" not in plan
    assert "FlatMapGroupsInPandas" in plan


def test_decontaminate_broadcast_probe_single_shuffle(spark):
    """Decontamination: the eval vocab joins broadcast (map-side
    probe); the only exchange is the id-keyed aggregation, and partial
    aggregation runs before it (shuffle carries partials, not the
    train shingle stream)."""
    from dogsheep_beta_spark.operators.dedup import decontaminate

    docs = spark.createDataFrame(
        [(i, "tok%d the quick brown fox jumps over it" % i) for i in range(20)],
        "doc_id long, text string",
    )
    ev = docs.where(F.col("doc_id") % 5 == 0)
    tr = docs.where(F.col("doc_id") % 5 != 0)
    plan = (
        decontaminate(tr, ev, "doc_id", "text", k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # exactly three hash exchanges, each behind a map-side HashAggregate:
    # (1) the tiny eval-vocab distinct feeding the BroadcastExchange,
    # (2) the (id, hit-shingle) dedup of count_distinct's expansion —
    #     partial HashAggregate collapses every non-hit to one
    #     (id, null) row per partition, so it carries ~contamination,
    #     never the raw train shingle stream,
    # (3) the final id-keyed partial_count merge (one row per id).
    import re as _re

    hash_exchanges = len(_re.findall(r"Exchange hashpartitioning", plan))
    assert hash_exchanges == 3
    assert "partial_count" in plan  # map-side partial aggregation
    # the distinct-expansion dedup aggregate runs BEFORE its exchange
    assert _re.search(
        r"HashAggregate\(keys=\[id[^\]]*CASE WHEN", plan
    ), "expected map-side (id, conditional-shingle) dedup"


def test_deterministic_shuffle_no_single_partition_window(spark):
    """Global shuffle-rank must never compile to the one-partition
    ORDER-BY window: the only exchanges are the hash-prefix bucket
    partitioning (corpus-wide) and the tiny bucket-size aggregate that
    broadcasts back."""
    from dogsheep_beta_spark.operators.sampling import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    plan = (
        deterministic_shuffle(df, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the corpus shuffles on the hash-prefix bucket...
    assert "Exchange hashpartitioning(__b" in plan
    # ...and the only single-partition exchange is the offsets cumsum
    # over the ≤prefix_buckets-row bucket-size AGGREGATE (tiny by
    # construction), never the corpus rows themselves:
    import re as _re

    singles = len(_re.findall(r"Exchange SinglePartition", plan))
    assert singles == 1
    assert _re.search(
        r"Exchange SinglePartition[^\n]*\n[^\n]*HashAggregate", plan
    ), "single-partition exchange must sit on the bucket-size aggregate"
    assert "BroadcastHashJoin" in plan  # offsets join small-side

    from dogsheep_beta_spark.operators.sampling import mixture_sample

    mplan = (
        mixture_sample(df.withColumn("source", F.lit("a")), "source", "doc_id", {"a": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in mplan  # pure map-side filter


def test_verbatim_overlap_no_cartesian(spark):
    """Substring dedup must stay a bounded-key equi-join pipeline:
    the shingle self-join is keyed on the hash (no cartesian/nested
    loop), and run detection is FUSED into the per-pair aggregation —
    no Window operator anywhere (the old gaps-and-islands plan paid
    four keyed shuffles after the join; the fold pays one)."""
    from dogsheep_beta_spark.operators.dedup import verbatim_overlap_pairs

    df = spark.createDataFrame(
        [(i, "a b c d e f g h i j k l") for i in range(6)],
        "doc_id long, text string",
    )
    reg = []
    plan = (
        verbatim_overlap_pairs(
            df, "doc_id", "text", k=5, min_tokens=8, cache_registry=reg
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    for c in reg:
        c.unpersist()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan  # run detection lives in the aggregate
    # hot-shingle pruning is a map-side broadcast anti-join
    assert "LeftAnti, BuildRight" in plan or "BroadcastHashJoin" in plan


def test_minhash_lsh_hot_bucket_cap_bounds_candidates(spark):
    """A mass-duplicated corpus (one 1000-way exact-dup class) must NOT
    produce O(w²) candidate pairs when ``max_bucket`` is set: hot
    buckets emit a rank-chain (w−1 rows per band), and connected
    components over the verified chain still recover the entire
    duplicate class as ONE cluster."""
    from dogsheep_beta_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    n = 1000
    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(i, text) for i in range(n)] + [(n, "something else entirely here")],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, n_hashes=16, bands=8, max_bucket=50
    ).persist()
    n_pairs = pairs.count()
    # uncapped: 8 bands × 1000²/2 ≈ 4M candidates collapsing to ~500k
    # distinct pairs; chained: ≤ w−1 distinct pairs (every band chains
    # the same id order, so the 8 chains coincide)
    assert n_pairs <= n - 1
    # transitivity recovers the full class from the chain
    comp = connected_components(pairs.filter(F.col("jaccard") >= 0.99))
    n_nodes = comp.count()
    n_comps = comp.select("comp").distinct().count()
    pairs.unpersist()
    assert n_nodes == n and n_comps == 1


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located fact⋈fact: both sides written bucketed by the join key
    (same bucket count) must sort-merge join with ZERO Exchange nodes —
    the write-time shuffle replaces every query-time shuffle.  This is
    the layout contract `join_bucketed_colocated` relies on."""
    from dogsheep_beta_spark.operators.bucketed import bucketed_join, write_bucketed

    register_testdata(spark, SF_DIR, tables=("customer", "orders"))
    write_bucketed(
        spark.table("customer"), "t_bkt_cust", "c_custkey", 4,
        str(tmp_path / "cust"),
    )
    write_bucketed(
        spark.table("orders"), "t_bkt_ord", "o_custkey", 4,
        str(tmp_path / "ord"),
    )
    joined = bucketed_join(spark, "t_bkt_cust", "t_bkt_ord", "c_custkey", "o_custkey")
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # neither side reshuffles
    # same content as the plain join
    plain = spark.table("customer").join(
        spark.table("orders"),
        F.col("c_custkey") == F.col("o_custkey"),
    )
    assert joined.count() == plain.count()
    spark.sql("DROP TABLE IF EXISTS t_bkt_cust")
    spark.sql("DROP TABLE IF EXISTS t_bkt_ord")


def test_bloom_runtime_filter_injected(spark):
    """The bloom-pruned semi-join must carry Catalyst's injected
    might_contain probe on the fact side (operators/runtime_filter.py)
    — the shuffled-bytes ∝ matches contract at 100 TB."""
    from dogsheep_beta_spark.operators.runtime_filter import (
        bloom_pruned_semi_join,
        freeze_bloom_plan,
    )

    register_testdata(spark, SF_DIR, tables=("lineitem", "orders"))
    li = spark.table("lineitem")
    dim = spark.table("orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    j = freeze_bloom_plan(
        bloom_pruned_semi_join(li, dim, li.l_orderkey == dim.o_orderkey)
    )
    opt = j._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in opt and "bloom_filter_agg" in opt
    # the DECLARED query must carry the filter in its final plan too —
    # downstream transforms re-optimize and would silently drop it if
    # the freeze were applied to an intermediate DataFrame
    import __spark_entry__ as entry

    q = entry.q_join_bloom_pruned(spark, SF_DIR)
    qopt = q._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in qopt and "bloom_filter_agg" in qopt
    # overapproximation + exact join == plain semi-join
    plain = li.join(dim, li.l_orderkey == dim.o_orderkey, "left_semi")
    assert sorted(r["l_orderkey"] for r in j.select("l_orderkey").collect()) == sorted(
        r["l_orderkey"] for r in plain.select("l_orderkey").collect()
    )


def test_sliding_chunks_semantics_and_map_only_plan(spark):
    from dogsheep_beta_spark.operators.chunking import sliding_chunks

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, words), (2, "a b c"), (3, ""), (4, None)],
        "doc_id int, text string",
    )
    out = sliding_chunks(df, "doc_id", "text", window=4, stride=3)
    rows = {(r["id"], r["chunk_idx"]): r for r in out.collect()}
    # doc 1: 10 tokens, w=4 s=3 -> 1 + ceil(6/3) = 3 chunks
    assert {k for k in rows if k[0] == 1} == {(1, 0), (1, 1), (1, 2)}
    assert rows[(1, 0)]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[(1, 1)]["chunk_text"] == "w3 w4 w5 w6"  # 1-token overlap
    assert rows[(1, 2)]["chunk_text"] == "w6 w7 w8 w9"
    assert rows[(1, 2)]["n_tok"] == 4
    # doc 2: 3 tokens <= window -> single whole-doc chunk
    assert rows[(2, 0)]["chunk_text"] == "a b c" and rows[(2, 0)]["n_tok"] == 3
    # empty / NULL docs emit no chunks
    assert not any(k[0] in (3, 4) for k in rows)
    # map-only: no exchange anywhere in the chunker plan
    assert "Exchange" not in _plan(out)


def test_sliding_chunks_tail_never_empty(spark):
    """Stride landing exactly on the end must not emit an empty tail
    chunk (n=6, w=3, s=3 -> exactly 2 chunks, not 3)."""
    from dogsheep_beta_spark.operators.chunking import sliding_chunks

    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id int, text string")
    out = sliding_chunks(df, "doc_id", "text", window=3, stride=3).collect()
    assert [(r["chunk_idx"], r["chunk_text"]) for r in sorted(out, key=lambda r: r["chunk_idx"])] == [
        (0, "a b c"),
        (1, "d e f"),
    ]


def test_pq_plans_broadcast_and_topk(spark):
    """PQ scale shapes: codebook joins broadcast (never shuffle the
    corpus on codes), ADC top-k compiles to TakeOrderedAndProject."""
    from dogsheep_beta_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    register_testdata(spark, SF_DIR, tables=("embeddings",))
    e = spark.table("embeddings")
    cb = pq_codebooks(e, "vec_id", "embedding", m=4, k=8)
    codes = pq_encode(e, "vec_id", "embedding", cb, m=4)
    qdf = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    top = pq_adc_topk(codes, cb, qdf, m=4, topk=20)
    enc_plan = _plan(codes)
    top_plan = _plan(top)
    assert "BroadcastHashJoin" in enc_plan and "SortMergeJoin" not in enc_plan
    assert "TakeOrderedAndProject" in top_plan
    assert "SortMergeJoin" not in top_plan


def test_temporal_extensions_plan_shapes(spark):
    """New temporal family stays one-shuffle-per-key-stage:
    tolerance as-of adds NO shuffle over the base as-of (gate is a
    post-window CASE in the same Window operator); rolling_time_agg is
    one exchange + one Window; gap_fill's spine never exceeds two
    hash exchanges on the key (span agg + dense join) plus the locf
    window reusing the join's partitioning."""
    from datetime import datetime

    from dogsheep_beta_spark.operators.temporal import (
        as_of_join,
        gap_fill,
        rolling_time_agg,
    )

    t0 = datetime(2024, 1, 1, 10)
    df = spark.createDataFrame(
        [(1, t0, 1.0)], "k int, t timestamp, v double"
    )
    base = as_of_join(
        df, df.selectExpr("k", "t as rt", "v as rv"),
        on=["k"], left_ts="t", right_ts="rt", right_cols=["rv"],
    )
    tol = as_of_join(
        df, df.selectExpr("k", "t as rt", "v as rv"),
        on=["k"], left_ts="t", right_ts="rt", right_cols=["rv"],
        tolerance_seconds=60,
    )
    base_plan = base._jdf.queryExecution().executedPlan().toString()
    tol_plan = tol._jdf.queryExecution().executedPlan().toString()
    assert tol_plan.count("Exchange") == base_plan.count("Exchange")
    assert tol_plan.count("Window") == base_plan.count("Window")

    roll_plan = (
        rolling_time_agg(df, ["k"], "t", "v", 3600)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert roll_plan.count("Exchange") == 1
    assert roll_plan.count("Window") == 1

    rollup = spark.createDataFrame(
        [("a", t0, 1, 1.0)], "key string, bucket timestamp, n long, g double"
    )
    gf_plan = (
        gap_fill(rollup, ["key"], "bucket", 3600,
                 zero_cols=["n"], ffill_cols=["g"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re as _re

    assert len(_re.findall(r"Exchange hashpartitioning", gf_plan)) == 2
    assert "Join" not in gf_plan
    assert "Exchange SinglePartition" not in gf_plan
    assert "CartesianProduct" not in gf_plan and "NestedLoop" not in gf_plan


def test_paragraph_chunks_boundaries_and_map_only(spark):
    """Blank-line splitting: 2+ newlines separate, single newlines stay
    inside a paragraph, whitespace-only fragments are dropped, index
    counts only kept paragraphs — and the plan is pure map-side."""
    from dogsheep_beta_spark.operators.chunking import paragraph_chunks

    df = spark.createDataFrame(
        [
            (1, "first para\nstill first\n\nsecond\n\n\n\t \n\nthird"),
            (2, "   \n\n  "),  # nothing survives
            (3, None),
            (4, "single"),
        ],
        "doc_id long, text string",
    )
    out = paragraph_chunks(df, "doc_id", "text").orderBy("id", "para_idx")
    rows = [(r["id"], r["para_idx"], r["para_text"]) for r in out.collect()]
    assert rows == [
        (1, 1, "first para\nstill first"),
        (1, 2, "second"),
        (1, 3, "third"),
        (4, 1, "single"),
    ]
    assert "Exchange" not in _plan(paragraph_chunks(df, "doc_id", "text"))


def test_paragraph_boilerplate_detection(spark):
    """The cross-document paragraph-hash core of q_dedup_paragraphs:
    a footer shared by 3 docs is flagged (docs>1), unique paragraphs
    are not, and within-doc repetition alone is not cross-doc."""
    footer = "subscribe to our newsletter"
    df = spark.createDataFrame(
        [
            (1, f"alpha body\n\n{footer}"),
            (2, f"beta body\n\n{footer}"),
            (3, f"gamma body\n\n{footer}"),
            (4, "self echo\n\nself echo"),  # repeated only inside doc 4
        ],
        "doc_id long, text string",
    )
    from dogsheep_beta_spark.operators.chunking import paragraph_chunks

    paras = paragraph_chunks(df, "doc_id", "text")
    per_hash = paras.groupBy(F.md5("para_text").alias("h")).agg(
        F.count(F.lit(1)).alias("occ"),
        F.count_distinct("id").alias("docs"),
        F.min("para_text").alias("t"),
    )
    shared = {r["t"]: r for r in per_hash.where(F.col("docs") > 1).collect()}
    assert set(shared) == {footer}
    assert shared[footer]["occ"] == 3 and shared[footer]["docs"] == 3
    echo = per_hash.where(F.col("t") == "self echo").collect()[0]
    assert echo["occ"] == 2 and echo["docs"] == 1


def test_entity_linkage_plan_keyed_cap_partial_argmin(spark):
    """Record linkage plan contract: the candidate join is an
    equi-join on the blocking key (no cartesian); the block-size cap
    is a count window KEYED on that blocking key (never a
    single-partition window, and no broadcast-materialization jobs);
    the best-match reduction is a partial-aggregable min_by."""
    from dogsheep_beta_spark.operators.linkage import (
        best_match,
        link_entities,
    )

    register_testdata(spark, SF_DIR, tables=("customer",))
    out = best_match(
        link_entities(
            spark.table("customer"), "c_custkey", "c_name",
            block_cols=("c_nationkey",), prefix_len=16, max_dist=1,
        )
    )
    p = _plan(out)
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    assert "SinglePartition" not in p  # cap window is keyed
    assert "min_by" in p or "SortAggregate" in p


def test_search_tokenizer_args_plan_broadcasts(spark):
    """The tokenizer-args search (r6) compiles to the same shape as
    every other search: broadcast scored-docset join + top-k via
    TakeOrderedAndProject, no sort-merge join."""
    import __spark_entry__ as entry

    df = entry.q_search_tokenizer_args(spark, SF_DIR)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    entry.teardown(SF_DIR)


def test_strip_boilerplate_plan_shape(spark):
    """Removal = hash-agg + hot-mark join + ONE per-doc aggregation:
    no cartesian, no window, and exactly one final per-id aggregate
    (the r6 first cut paid an extra shuffle for separate stats)."""
    from dogsheep_beta_spark.operators.chunking import strip_boilerplate

    df = spark.createDataFrame(
        [(i, f"common head\n\nbody {i}") for i in range(8)],
        "doc_id long, text string",
    )
    plan = (
        strip_boilerplate(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    # one aggregation keyed on id (partial+final pair), not two
    assert plan.count("functions=[count(1)") <= 2


def test_importance_scoring_plan_is_map_only(spark):
    """DSIR scoring with precomputed ratios: an array-literal fold —
    no join, no Exchange anywhere; the declared query's top-50 is
    TakeOrderedAndProject, never a global sort."""
    from pyspark.sql import functions as F

    from dogsheep_beta_spark.operators.sampling import importance_weights

    df = spark.createDataFrame(
        [(i, f"alpha beta doc {i}") for i in range(16)],
        "doc_id long, text string",
    )
    scored = importance_weights(
        df, "doc_id", "text", log_ratios=[0.0] * 64
    )
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    topk = (
        scored.select("doc_id", F.round("logw", 6).alias("logw"))
        .orderBy(F.desc("logw"), "doc_id")
        .limit(50)
    )
    tplan = topk._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in tplan


def test_sketch_plans_bounded_state(spark):
    """KMV: the exchange carries per-partition DISTINCT hashes (partial
    HashAggregate before the Exchange) and the synopsis is a
    TakeOrderedAndProject — never a full-cardinality sort.  CMS lookup:
    the ≤depth*width sketch broadcasts; the candidate side never
    sort-merge-joins."""
    from dogsheep_beta_spark.operators.sketches import (
        cms_build,
        cms_lookup,
        kmv_sketch,
    )

    df = spark.range(0, 1000).select(F.col("id").alias("v"))
    kplan = _plan(kmv_sketch(df, "v", k=64))
    assert "TakeOrderedAndProject" in kplan
    # partial dedup before the shuffle: a keyed HashAggregate appears
    # on the map side (below the Exchange in the plan string)
    assert kplan.index("HashAggregate") < kplan.index("Exchange") or (
        "Exchange" in kplan and kplan.count("HashAggregate") >= 2
    )

    cms = cms_build(df, "v", width=64, depth=3)
    items = df.distinct().limit(10)
    lplan = _plan(cms_lookup(cms, items, "v", 64, 3))
    assert "BroadcastHashJoin" in lplan
    assert "SortMergeJoin" not in lplan


def test_sampler_queries_same_session_double_evaluation(spark):
    """Determinism pin for EVERY declared sampler query (round 7,
    VERDICT r6 #2): evaluate each twice in the same session and demand
    byte-identical rows.  A deterministic engine must never hash-flake
    — the driver's r06 artifact recorded exactly one such flake
    (sample_token_budget), fixed by the integer-exact keep predicate
    in operators/sampling.py; this test keeps every sampler honest."""
    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    samplers = sorted(k for k in entry.queries() if k.startswith("sample_"))
    assert samplers, "no sampler queries declared?"
    for name in samplers:
        fn = entry.queries()[name]
        a = [tuple(map(repr, r)) for r in fn(spark, sf_dir).collect()]
        b = [tuple(map(repr, r)) for r in fn(spark, sf_dir).collect()]
        assert sorted(a) == sorted(b), f"{name} diverged across evaluations"


def test_fingerprint_table_is_map_only(spark):
    """Round-7 rewrite pin: the winnowing fingerprint is one bound-norm
    HOF per document — no Exchange, no Generate (the old explode shape
    duplicated the normalized string into every window row)."""
    from dogsheep_beta_spark.functions.text import fingerprint_table

    df = spark.createDataFrame(
        [(1, "some document text here")], "id long, text string"
    )
    plan = (
        fingerprint_table(df, "id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Generate" not in plan


def test_r9_wave_plan_shapes(spark):
    """Plan pins for the round-9 wave queries (PLANS.md claims):

    - phrase mining: per-slice top-k rank-prunes map-side
      (WindowGroupLimit BEFORE the window exchange), no SortMergeJoin;
    - attribution: exactly one user-keyed window, no join at all;
    - vocab coverage: the corpus-sized (source, token) shuffle is
      materialized ONCE at runtime (AQE ReusedExchange / shared
      shuffle stage), and the top-100 joins back broadcast;
    - retention: cohort sizes join back broadcast."""
    import __spark_entry__ as entry

    qs = entry.queries()

    phrase = qs["text_phrase_topk"](spark, SF_DIR)
    p = _plan(phrase)
    assert "WindowGroupLimit" in p
    assert "SortMergeJoin" not in p

    attach = qs["events_attribution_last_touch"](spark, SF_DIR)
    p = _plan(attach)
    assert p.count("Window") >= 1
    assert "Join" not in p  # window + aggregate only

    vocab = qs["vocab_coverage_report"](spark, SF_DIR)
    vocab.collect()  # AQE reuse is a runtime decision — force final plan
    p = vocab._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastHashJoin" in p
    # the two (source, token) aggregate branches share one shuffle:
    # either the pre-AQE ReuseExchange rule or AQE stage reuse marks it
    assert ("ReusedExchange" in p) or ("ReusedQueryStage" in p), p[:2000]

    ret = qs["events_retention_cohort"](spark, SF_DIR)
    p = _plan(ret)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_r9_late_wave_plan_shapes(spark):
    """Plan pins for the late-r9 queries:

    - pack_bin_offsets: the boundary window rides pack_greedy's
      existing (shard)-keyed output — no SortMergeJoin anywhere;
    - text_ngram_novelty: the first-occurrence aggregate and the probe
      join both key on the gram — no broadcast of a corpus-sized side
      (the join must be a shuffle join on gram, not a broadcast NL);
    - sample_mixture_waterfill: the corpus-sized side appears in
      exactly one aggregate subtree; the scalar panels rejoin via
      1-row broadcast cross joins (the documented no-collect idiom)."""
    import __spark_entry__ as entry

    qs = entry.queries()

    p = _plan(qs["pack_bin_offsets"](spark, SF_DIR))
    assert "SortMergeJoin" not in p
    assert "Window" in p

    p = _plan(qs["text_ngram_novelty"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in p

    p = _plan(qs["sample_mixture_waterfill"](spark, SF_DIR))
    assert "SortMergeJoin" not in p


def test_r10_pii_audit_plan_is_map_only(spark):
    """text_pii_card_audit: regex counts, Luhn fold and redaction md5
    are all one projection over the scan — no Exchange beyond the
    registration scatter + the presentation ORDER BY, no Generate, no
    Join (the Luhn validation must not explode candidates into rows)."""
    import __spark_entry__ as entry

    p = _plan(entry.queries()["text_pii_card_audit"](spark, SF_DIR))
    assert "Join" not in p
    assert "Generate" not in p
    # scatter-at-registration + final sort are the only exchanges
    assert p.count("Exchange") <= 2, p[:1500]
