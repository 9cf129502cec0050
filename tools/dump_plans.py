"""Regenerate PLANS.md — formatted physical plans for headline queries.

The plan-shape claims the engine makes (broadcast search joins, zero
Exchange on the bucketed join, TakeOrderedAndProject top-ks, pushed
filters, WindowGroupLimit before exchanges) are regression-tested in
tests/test_plans.py; this artifact makes the same evidence readable —
``.explain("formatted")`` output per query, checked in so a reviewer
can audit the 100 TB story without running Spark.

Usage: python tools/dump_plans.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# queries whose plan tells the scale story, with the claim each proves
HEADLINE = {
    "timeline_topk": "top-k compiles to TakeOrderedAndProject; no sort-merge join",
    "search_bm25_topk": "scored-docset joins broadcast; corpus stats broadcast",
    "join_bucketed_colocated": "bucketed layout consumed: zero Exchange on either join side",
    "join_topk_orders": "dim filter pushed to scan; broadcast customer; TakeOrdered",
    "dedup_minhash_lsh": "banded self-join on bucket key, no cartesian",
    "text_tfidf_cosine": "capped inverted-index self-join, broadcast small side",
    "ann_ivf_topk": "persisted cell layout: PartitionFilters prune probed cells",
    "sample_shuffle": "two-phase rank: no single-partition window",
    "pack_contiguous": "single shuffle on the shard key",
    "scd2_user_history": "both windows share one shuffle on the key",
    "window_running_total": "cumulative frame, one shuffle on user_id",
    "decontaminate": "broadcast eval vocab, map-side probe, one scan",
    "ann_pq_topk": "broadcast codebook + ADC lookup joins; TakeOrdered top-k",
    "join_bloom_pruned": "Catalyst-injected bloom might_contain below the fact shuffle",
    "chunk_sliding_window": "chunker itself is map-only (plan-asserted); the single Exchange here is the declared query's final ORDER BY",
    "graph_pagerank": "join-based supersteps, broadcast node count, no collect",
    "events_funnel": "monotonically shrinking stage joins, no windows",
    "sessions_error_overlap": "interval×interval equi-join on canonical bucket, no nested loop",
    "sample_curriculum_deciles": "broadcast percentile thresholds, map-side bucketing — no global ntile",
    "events_gap_fill": "join-free gap fill: union + one key-partitioned window resolves zero-fill and locf; two hash exchanges total",
    "window_time_range_avg": "time-RANGE frame over unix_micros, one shuffle on user_id",
    "chunk_paragraphs": "paragraph splitter is map-only; the single Exchange is the declared ORDER BY",
    "text_repetition": "map-only since r5: per-doc sorted-hash fold, zero exchanges before the declared ORDER BY",
    "dedup_verbatim_overlap": "winnowed anchors feed the candidate join; verification is one tagged stream pass, pair-bounded",
    "search_count_facets": "single rollup aggregation (GROUPING SETS) over the unscored docset",
    "hydrate_display": "persisted request-path filtered set; broadcast semi-prune + broadcast hydration join",
    "entity_link_best": "blocked self-equi-join on (nation, prefix); keyed count-window block cap rides the join partitioning; partial-aggregable min_by argmin",
    "entity_clusters": "block-local closure: one shuffle to hash-buckets of the blocking key, union-find per bucket — no supersteps",
    "dedup_semantic": "SemDeDup: broadcast centroids, blocked GEMM pair generation, components over dup docs only; labels/keepers rejoin by broadcast — the corpus never re-shuffles",
    "sample_importance": "DSIR scoring is a map-side array-literal fold (no join, no shuffle); top-50 compiles to TakeOrderedAndProject",
    "quality_gopher_rules": "all seven Gopher rules in one map-side projection; the only Exchange is the per-lang report aggregation",
    "clean_c4_lines": "C4 corpus synthesis + line/page rules fused into one map-side projection; the only Exchange is the per-source report aggregation",
    "sketch_kmv_distinct": "KMV synopsis: map-side partial dedup feeds the exchange (per-partition distincts only), TakeOrderedAndProject keeps k",
    "sketch_kmv_by_group": "per-group synopsis: WindowGroupLimit filters rank-k candidates before the window exchange",
    "sketch_cms_freq": "CMS build is one map-side explode into a depth*width-bounded partial agg; the point-query join broadcasts the sketch",
    "embedding_gram": "partial GEMM per partition (MapInPandas); the only data-sized exchange feeds the d^2-bounded cell aggregate (the scan-side Exchange is the registry's conditional single-row-group scatter, absent on real multi-row-group inputs; the last is the declared ORDER BY of 2080 cells)",
    "warc_source_ingest": "binaryFile file-level parallelism: one task per WARC segment, record split + HTTP split in-task",
    "robots_url_filter": "MAP-ONLY compliance filter: literal rules-map lookup + higher-order longest-match argmax; no Join, no Exchange before the report aggregate",
    "dedup_soft_weights": "one window count over the content hash (single shuffle, no join) feeds the weighted per-source report",
    "bpe_learn_merges": "per merge iteration: one partial-aggregated pair explode + TakeOrdered(1); map-only replace chain over the persisted base",
    "bpe_encode_corpus": "r7 encoder: the learned merge chain rides the scan as literal replaces — zero Exchange before the declared ORDER BY, no UDF",
    "text_fingerprint": "r7 rewrite: bound-norm HOF min-4, MAP-ONLY (the old explode-per-window shape duplicated the normalized string per row and shuffled one hash row per window — 4x slower)",
    "pack_bpe_exact": "r8: BPE-exact counts feed the packer — the learned merge chain rides the scan map-side (keep_cols passes the shard key, no re-join); the only exchanges are pack_greedy's shard shuffle and the declared ORDER BY (the InMemoryRelation-internal Exchange is the registry's single-row-group scatter, absent on real multi-row-group inputs)",
    "text_keywords": "r9: one tokenize+explode; the df aggregate consumes the tf stage's own (id, term) pairs — corpus text never shuffles, only (id, term, tf) rows; per-doc top-k is WindowGroupLimit-filtered before its window exchange",
    "media_mjpeg_frames": "r9: map-only both phases (Arrow synthesize -> Arrow demux+JPEG-decode); media bytes never shuffle; the single Exchange is the declared ORDER BY",
    "text_phrase_topk": "r9: two cascaded keyed aggregates (doc frequency consumes the occurrence stage's own pairs — no count_distinct re-expansion); per-slice top-k is WindowGroupLimit-filtered BEFORE its window exchange; corpus text never shuffles",
    "vocab_coverage_report": "r9: both branches derive from ONE (source, token) count aggregate — AQE ReusedExchange materializes the corpus shuffle once; the top-100 is vocab-bounded and broadcasts back, so the probe never touches corpus text",
    "events_attribution_last_touch": "r9: ONE user-keyed window carries the running last-non-purchase marker ((ts, event_id) deterministic order); the only other exchange is the channel-bounded rollup",
    "events_retention_cohort": "r9: raw events scan ONCE into the persisted (user, day) activity set (users x active-days rows); cohort MIN, sizes, and the matrix are aggregates OF the cache; cohort sizes broadcast back for the permille divide",
    "sample_mixture_waterfill": "r9: one corpus-sized partial-aggregated shuffle (per-group token sums); the closed-form waterfill runs on the G-row group table — the single-partition window is mixture-group-bounded, and the funded-prefix scalar rejoins broadcast",
    "text_ngram_novelty": "r9: the MIN-id first-occurrence aggregate and the join back share the gram-keyed exchange (one corpus-sized shuffle); gram STRINGS are the key — exactness over hash-width",
    "text_lang_confusion": "r9: JOIN-FREE — per-language stopword scores and the argmax are one map-side projection with the label on the same row; the only exchange is the langs^2-bounded matrix aggregate",
    "text_pii_card_audit": "r10: regex counts + the Luhn checksum fold + four-class redaction md5 are ONE projection over the scan — no Join, no Generate (candidates never explode into rows); plan-pinned in test_plans.py",
}

# deliberately NOT dumped: pipeline_dedup_cascade, ann_recall_report,
# ann_recall_clustered and pipeline_pretraining_corpus consume
# persisted _CTX panels, so their formatted plans are thousands of
# InMemoryScan lines with no extra evidence — their plan story (one
# window over a method-tagged union; per-stage ledger over persisted
# survivors) is asserted in COVERAGE.md and tests instead.  Same for
# search_hybrid_rrf (r9): its formatted plan is dominated by the BM25
# search subtree already dumped under search_bm25_topk; the RRF story
# (full-outer fusion of two bounded top-k lists, ≤200 rows at the
# join) is the strict oracle's + COVERAGE.md's claim.


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("dump_plans")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    out = [
        "# PLANS — formatted physical plans for headline queries",
        "",
        f"Generated by `python tools/dump_plans.py {sf_dir}`.  Regenerate",
        "after plan-affecting changes; the shapes below are also pinned by",
        "`tests/test_plans.py`.",
        "",
        "Reading note: `BroadcastNestedLoopJoin Cross BuildRight` nodes in",
        "these plans are 1-ROW broadcast cross joins (a query vector, a node",
        "count, a threshold array) — the deliberate no-collect way to inline",
        "a scalar aggregate into a scan, constant work per row at any scale.",
        "They are not data×data nested loops; every data-sized join below is",
        "a hash or broadcast-hash equi-join.",
        "",
    ]
    qs = entry.queries()
    for name, claim in HEADLINE.items():
        if name not in qs:
            continue
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # control chars leak into plan text as raw bytes (e.g. the
        # upsert tie-break's \x00 field separator) and flip the whole
        # artifact to "binary" for git/grep — print them escaped
        plan = "".join(
            c if c == "\n" or c == "\t" or ord(c) >= 32 else f"\\x{ord(c):02x}"
            for c in plan
        )
        out += [f"## {name}", "", f"**Claim:** {claim}", "", "```", plan.rstrip(), "```", ""]

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(out)} lines)")


if __name__ == "__main__":
    main()
