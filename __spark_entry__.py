"""Driver contract for the spark-graft builder (PySpark target).

Implements the SURVEY.md §2 operator inventory as declared (query, oracle)
pairs.  Each ``queries()[name]`` builds its plan with dogsheep_beta_spark;
``oracle_sql()[name]`` is the semantically-identical ANSI SQL DuckDB runs
over the same parquet tables (pre-registered views).

Determinism rules (SURVEY.md §7.3):
- every top-k appends the pk (type, key) as final tie-break;
- ``timestamp`` is an ISO-8601 *string* ordered lexicographically (F4);
- timestamps are stringified with an explicit microsecond format on both
  sides (Spark ``date_format .. 'yyyy-MM-dd HH:mm:ss.SSSSSS'`` ≡ DuckDB
  ``strftime .. '%Y-%m-%d %H:%M:%S.%f'``);
- float aggregates are rounded identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dogsheep_beta_spark.indexer import build_search_index
from dogsheep_beta_spark.operators import facets as facet_ops
from dogsheep_beta_spark.plans.query import QueryPlan, compile_plan, timeline_query
from dogsheep_beta_spark.schema import categories_df
from dogsheep_beta_spark.sources.registry import register_testdata

# ---------------------------------------------------------------------------
# search_index construction over the driver testdata (FIXTURES.md §6)
# ---------------------------------------------------------------------------

# Spark-side rules config.  Timestamps become strings with an explicit
# microsecond format so the DuckDB oracle can reproduce them exactly.
INDEX_CONFIG = {
    "docs.db": {
        "documents": {
            "sql": """
                select doc_id as key, source as title,
                       cast(null as string) as timestamp,
                       1 as category, 1 as is_public, text as search_1
                from documents
            """
        }
    },
    "events.db": {
        "events": {
            "sql": """
                select event_id as key, event_type as title,
                       date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') as timestamp,
                       3 as category, 0 as is_public, props as search_1
                from events
            """
        }
    },
    "orders.db": {
        "orders": {
            "sql": """
                select o_orderkey as key, o_orderpriority as title,
                       date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss.SSSSSS') as timestamp,
                       2 as category, 0 as is_public, o_orderstatus as search_1
                from orders
            """
        }
    },
}

# The same search_index as a DuckDB CTE (the oracle's view of the world).
ORACLE_INDEX_CTE = """
WITH search_index AS (
    SELECT 'docs.db/documents' AS type, CAST(doc_id AS VARCHAR) AS "key",
           source AS title, CAST(NULL AS VARCHAR) AS "timestamp",
           1 AS category, 1 AS is_public, text AS search_1,
           CAST(NULL AS VARCHAR) AS search_2, CAST(NULL AS VARCHAR) AS search_3
    FROM documents
    UNION ALL
    SELECT 'events.db/events', CAST(event_id AS VARCHAR), event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), 3, 0, props, NULL, NULL
    FROM events
    UNION ALL
    SELECT 'orders.db/orders', CAST(o_orderkey AS VARCHAR), o_orderpriority,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%f'), 2, 0, o_orderstatus,
           NULL, NULL
    FROM orders
)
"""


# Cache (per sf_dir): the built search_index (persisted) and its FTS
# index — queries share one build, like the reference's one-index-many-
# queries lifecycle.  The FTS index uses the PORTABLE tokenizer
# (lower + split [^a-z0-9]+) so the DuckDB oracle is expressible
# (SURVEY.md §5.3); Porter parity is pinned by tests/test_fts.py instead.
_CTX: dict[str, tuple] = {}


def _search_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_testdata(spark, sf_dir)
    return build_search_index(spark, INDEX_CONFIG)


def _ctx(spark: SparkSession, sf_dir: str):
    if sf_dir not in _CTX:
        from dogsheep_beta_spark.operators.fts_index import build_fts_index

        register_testdata(spark, sf_dir)
        idx = build_search_index(spark, INDEX_CONFIG).persist()
        fts = build_fts_index(idx, mode="portable", stem=False)
        _CTX[sf_dir] = (idx, fts)
    return _CTX[sf_dir]


def _bm25_results(spark, sf_dir, q, plan: QueryPlan | None = None) -> DataFrame:
    """Search top-k with rank rounded to 6dp (float-hash stability)."""
    from dogsheep_beta_spark.plans.search import scored_docs

    idx, fts = _ctx(spark, sf_dir)
    plan = plan or QueryPlan(q=q)
    plan.q = q
    scored = scored_docs(fts, q).withColumn("rank", F.round("rank", 6))
    res = compile_plan(idx, plan, scored=scored)
    return res.results.select("type", "key", "rank", "title", "timestamp")


# ---------------------------------------------------------------------------
# entry — flagship query (driver smoke check at sf0.001)
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: timeline top-k + filters over the built search index."""
    idx = _search_index(spark, "/root/testdata/sf0.001")
    return timeline_query(idx, QueryPlan())


# ---------------------------------------------------------------------------
# declared queries
# ---------------------------------------------------------------------------


def q_timeline_topk(spark, sf_dir):
    """F2/F4/G1/A5: no-q timeline — ORDER BY timestamp DESC LIMIT 40."""
    idx = _search_index(spark, sf_dir)
    return timeline_query(idx, QueryPlan()).select(
        "type", "key", "title", "timestamp", "category", "is_public"
    )


def q_timeline_filter_eq_date(spark, sf_dir):
    """B3+B4: equality filters AND date() filter, then timeline order."""
    idx = _search_index(spark, sf_dir)
    plan = QueryPlan(category=3, is_public=0, date="2024-01-15")
    return timeline_query(idx, plan).select("type", "key", "title", "timestamp")


def q_count_filtered(spark, sf_dir):
    """D1: exact filtered count (is_public = 0)."""
    idx = _search_index(spark, sf_dir)
    from dogsheep_beta_spark.plans.query import apply_filters

    filtered = apply_filters(idx, QueryPlan(is_public=0))
    return filtered.agg(F.count(F.lit(1)).alias("cnt"))


def q_facet_type(spark, sf_dir):
    """D2: type facet over the full set."""
    idx = _search_index(spark, sf_dir)
    return facet_ops.column_facet(idx, "type")


def q_facet_category_labeled(spark, sf_dir):
    """D2+C4: category facet with FK label expansion (broadcast join)."""
    idx = _search_index(spark, sf_dir)
    facet = facet_ops.column_facet(idx, "category")
    return facet_ops.facet_with_labels(facet, categories_df(spark))


def q_facet_is_public(spark, sf_dir):
    """D2: is_public facet computed on a filtered set (D4)."""
    idx = _search_index(spark, sf_dir)
    from dogsheep_beta_spark.plans.query import apply_filters

    filtered = apply_filters(idx, QueryPlan(category=2))
    return facet_ops.column_facet(filtered, "is_public")


def q_facet_date(spark, sf_dir):
    """D3: date(timestamp) facet, top-30 buckets by count."""
    idx = _search_index(spark, sf_dir)
    return facet_ops.date_facet(idx, "timestamp")


def q_rule_join_extraction(spark, sf_dir):
    """C1/B1/B2/H1/H3: a rule whose SQL joins orders→customer→nation→region
    and computes title/category with || and CASE — run through the same
    conform + index pipeline, top 50 by key."""
    register_testdata(spark, sf_dir)
    cfg = {
        "tpch.db": {
            "order_geo": {
                "sql": """
                    select o.o_orderkey as key,
                           'Order by ' || c.c_name || ' from ' || n.n_name as title,
                           date_format(o.o_orderdate, 'yyyy-MM-dd HH:mm:ss.SSSSSS') as timestamp,
                           case r.r_name when 'AMERICA' then 1
                                         when 'EUROPE' then 2
                                         else 3 end as category,
                           case when o.o_totalprice > 100000 then 1 else 0 end as is_public,
                           o.o_orderstatus as search_1
                    from orders o
                    join customer c on o.o_custkey = c.c_custkey
                    join nation n on c.c_nationkey = n.n_nationkey
                    join region r on n.n_regionkey = r.r_regionkey
                """
            }
        }
    }
    idx = build_search_index(spark, cfg)
    return (
        idx.orderBy(F.col("key").cast("long"))
        .limit(50)
        .select("type", "key", "title", "timestamp", "category", "is_public", "search_1")
    )


def q_upsert_last_writer(spark, sf_dir):
    """A5: two index runs over the same (type,key) space — run 2 must win.

    Simulated as two rule loads with explicit load_seq, exactly the
    REPLACE INTO semantics (utils.py:49-54)."""
    register_testdata(spark, sf_dir)
    from dogsheep_beta_spark.operators.conform import conform
    from dogsheep_beta_spark.operators.upsert import last_writer_wins, union_conformed

    run1 = conform(
        spark.sql(
            "select o_orderkey as key, o_orderstatus as title from orders"
        ),
        "orders.db/orders",
    ).withColumn("load_seq", F.lit(0))
    run2 = conform(
        spark.sql(
            """select o_orderkey as key, 'v2:' || o_orderpriority as title
               from orders where o_orderkey % 3 = 0"""
        ),
        "orders.db/orders",
    ).withColumn("load_seq", F.lit(1))
    merged = last_writer_wins(union_conformed([run1, run2]))
    return (
        merged.orderBy(F.col("key").cast("long"))
        .limit(100)
        .select("type", "key", "title", "is_public")
    )


def q_agg_pricing_summary(spark, sf_dir):
    """D-family: grouped aggregation with partial (map-side) combine —
    TPC-H Q1-shaped pricing summary over lineitem."""
    register_testdata(spark, sf_dir)
    li = spark.table("lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_join_topk_orders(spark, sf_dir):
    """C1+F1-shape: join + agg + deterministic top-k (TPC-H Q3-shaped)."""
    register_testdata(spark, sf_dir)
    cust = spark.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = spark.table("orders")
    li = spark.table("lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_search_bm25_topk(spark, sf_dir):
    """B5/C2/H9/F1/D5/A9: implicit-AND full-text search, BM25 top-k."""
    return _bm25_results(spark, sf_dir, "spark join")


def q_search_not(spark, sf_dir):
    """B5/C5: NOT compiles to an anti-join over the postings doc-sets."""
    return _bm25_results(spark, sf_dir, "window NOT spark")


def q_search_or(spark, sf_dir):
    """B5: OR compiles to union-distinct of doc-sets."""
    return _bm25_results(spark, sf_dir, "filter OR window")


def q_search_phrase(spark, sf_dir):
    """B5: quoted phrase — positional adjacency via array_intersect."""
    return _bm25_results(spark, sf_dir, '"batch stream"')


def q_search_prefix(spark, sf_dir):
    """B5: prefix* — startswith over the term dictionary."""
    return _bm25_results(spark, sf_dir, "wind*")


def q_search_escape_fallback(spark, sf_dir):
    """B6/H8: '#spark' is FTS-invalid → escape_fts retry path → bareword."""
    return _bm25_results(spark, sf_dir, "#spark")


def q_search_filtered(spark, sf_dir):
    """B3+B5: MATCH combined with equality facet filters."""
    return _bm25_results(
        spark, sf_dir, "spark", QueryPlan(q="spark", category=1, is_public=1)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "timeline_topk": q_timeline_topk,
        "timeline_filter_eq_date": q_timeline_filter_eq_date,
        "count_filtered": q_count_filtered,
        "facet_type": q_facet_type,
        "facet_category_labeled": q_facet_category_labeled,
        "facet_is_public": q_facet_is_public,
        "facet_date": q_facet_date,
        "rule_join_extraction": q_rule_join_extraction,
        "upsert_last_writer": q_upsert_last_writer,
        "agg_pricing_summary": q_agg_pricing_summary,
        "join_topk_orders": q_join_topk_orders,
        "search_bm25_topk": q_search_bm25_topk,
        "search_not": q_search_not,
        "search_or": q_search_or,
        "search_phrase": q_search_phrase,
        "search_prefix": q_search_prefix,
        "search_escape_fallback": q_search_escape_fallback,
        "search_filtered": q_search_filtered,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB, same tables pre-registered as views)
# ---------------------------------------------------------------------------

# Portable FTS definition shared with the engine (SURVEY.md §5.3):
# tokenize = lower + split [^a-z0-9]+; postings/doclen/corpus stats as
# plain SQL aggregates; BM25 with FTS5's constants and idf clamp.
ORACLE_FTS_CTE = ORACLE_INDEX_CTE + """
, tokens AS (
    SELECT type, "key", field, unnest(toks) AS term,
           generate_subscripts(toks, 1) - 1 AS pos
    FROM (
        SELECT type, "key", 'title' AS field,
               list_filter(string_split_regex(lower(coalesce(title, '')),
                           '[^a-z0-9]+'), x -> x <> '') AS toks
        FROM search_index
        UNION ALL
        SELECT type, "key", 'search_1',
               list_filter(string_split_regex(lower(coalesce(search_1, '')),
                           '[^a-z0-9]+'), x -> x <> '')
        FROM search_index
    )
), postings AS (
    SELECT term, type, "key", field, COUNT(*) AS tf
    FROM tokens GROUP BY term, type, "key", field
), doclen AS (
    SELECT type, "key", COUNT(*) AS dl FROM tokens GROUP BY type, "key"
), stats AS (
    SELECT (SELECT COUNT(*) FROM search_index) AS n_docs,
           (SELECT COALESCE(SUM(dl), 0) FROM doclen) * 1.0
             / (SELECT COUNT(*) FROM search_index) AS avgdl
)
"""

_BM25_FORMULA = (
    'GREATEST(LN((s.n_docs - d.df + 0.5) / (d.df + 0.5)), 1e-6)'
    ' * (h.tf * 2.2)'
    ' / (h.tf + 1.2 * (0.25 + 0.75 * COALESCE(l.dl, 0) / s.avgdl))'
)


def _hits_block(name: str, hits_sql: str) -> str:
    """One phrase's hits + df + BM25 contribution CTEs."""
    return f"""
, {name} AS ({hits_sql})
, {name}_df AS (SELECT COUNT(*) AS df FROM {name})
, {name}_c AS (
    SELECT h.type, h."key", {_BM25_FORMULA} AS c
    FROM {name} h
    CROSS JOIN {name}_df d
    LEFT JOIN doclen l ON h.type = l.type AND h."key" = l."key"
    CROSS JOIN stats s
)"""


def _term_hits(pred: str) -> str:
    return (
        f'SELECT type, "key", SUM(tf) AS tf FROM postings WHERE {pred} '
        'GROUP BY type, "key"'
    )


def _phrase2_hits(t1: str, t2: str) -> str:
    return f"""
        SELECT a.type, a."key", COUNT(*) AS tf
        FROM tokens a
        JOIN tokens b ON a.type = b.type AND a."key" = b."key"
                     AND a.field = b.field AND b.pos = a.pos + 1
        WHERE a.term = '{t1}' AND b.term = '{t2}'
        GROUP BY a.type, a."key"
    """


def _search_oracle(
    blocks: list[tuple[str, str]], matched_sql: str, extra_where: str = ""
) -> str:
    """Assemble a full search oracle query from phrase hit blocks."""
    ctes = "".join(_hits_block(n, sql) for n, sql in blocks)
    contribs = " UNION ALL ".join(f"SELECT * FROM {n}_c" for n, _ in blocks)
    return (
        ORACLE_FTS_CTE
        + ctes
        + f"""
, matched AS ({matched_sql})
, contrib AS ({contribs})
, scored AS (
    SELECT type, "key", ROUND(-SUM(c), 6) AS rank
    FROM contrib GROUP BY type, "key"
)
SELECT m.type, m."key", s.rank, si.title, si."timestamp"
FROM matched m
JOIN scored s ON m.type = s.type AND m."key" = s."key"
JOIN search_index si ON m.type = si.type AND m."key" = si."key"
{extra_where}
ORDER BY s.rank ASC, si."timestamp" DESC NULLS LAST, m.type ASC, m."key" ASC
LIMIT 100
"""
    )


def oracle_sql() -> dict[str, str]:
    return {
        "timeline_topk": ORACLE_INDEX_CTE
        + """
            SELECT type, "key", title, "timestamp", category, is_public
            FROM search_index
            ORDER BY "timestamp" DESC NULLS LAST, type ASC, "key" ASC
            LIMIT 40
        """,
        "timeline_filter_eq_date": ORACLE_INDEX_CTE
        + """
            SELECT type, "key", title, "timestamp"
            FROM search_index
            WHERE category = 3 AND is_public = 0
              AND CAST("timestamp" AS DATE) = DATE '2024-01-15'
            ORDER BY "timestamp" DESC NULLS LAST, type ASC, "key" ASC
            LIMIT 40
        """,
        "count_filtered": ORACLE_INDEX_CTE
        + """
            SELECT COUNT(*) AS cnt FROM search_index WHERE is_public = 0
        """,
        "facet_type": ORACLE_INDEX_CTE
        + """
            SELECT type AS value, COUNT(*) AS count
            FROM search_index GROUP BY type
            ORDER BY count DESC, value ASC LIMIT 30
        """,
        "facet_category_labeled": ORACLE_INDEX_CTE
        + """
            , facet AS (
                SELECT category AS value, COUNT(*) AS count
                FROM search_index GROUP BY category
                ORDER BY count DESC, value ASC LIMIT 30
            )
            SELECT f.value, c.name AS label, f.count
            FROM facet f
            LEFT JOIN (VALUES (1, 'created'), (2, 'saved'), (3, 'received'))
                 AS c(id, name) ON f.value = c.id
            ORDER BY f.count DESC, f.value ASC
        """,
        "facet_is_public": ORACLE_INDEX_CTE
        + """
            SELECT is_public AS value, COUNT(*) AS count
            FROM search_index WHERE category = 2 GROUP BY is_public
            ORDER BY count DESC, value ASC LIMIT 30
        """,
        "facet_date": ORACLE_INDEX_CTE
        + """
            SELECT CAST("timestamp" AS DATE) AS value, COUNT(*) AS count
            FROM search_index WHERE "timestamp" IS NOT NULL
            GROUP BY CAST("timestamp" AS DATE)
            ORDER BY count DESC, value ASC LIMIT 30
        """,
        "rule_join_extraction": """
            SELECT 'tpch.db/order_geo' AS type,
                   CAST(o.o_orderkey AS VARCHAR) AS "key",
                   'Order by ' || c.c_name || ' from ' || n.n_name AS title,
                   strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S.%f') AS "timestamp",
                   CASE r.r_name WHEN 'AMERICA' THEN 1
                                 WHEN 'EUROPE' THEN 2
                                 ELSE 3 END AS category,
                   CASE WHEN o.o_totalprice > 100000 THEN 1 ELSE 0 END AS is_public,
                   o.o_orderstatus AS search_1
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            ORDER BY o.o_orderkey ASC
            LIMIT 50
        """,
        "upsert_last_writer": """
            WITH run1 AS (
                SELECT 'orders.db/orders' AS type,
                       CAST(o_orderkey AS VARCHAR) AS "key",
                       o_orderstatus AS title, 0 AS load_seq
                FROM orders
            ), run2 AS (
                SELECT 'orders.db/orders', CAST(o_orderkey AS VARCHAR),
                       'v2:' || o_orderpriority, 1
                FROM orders WHERE o_orderkey % 3 = 0
            ), merged AS (
                SELECT * FROM (SELECT * FROM run1 UNION ALL SELECT * FROM run2)
                QUALIFY row_number() OVER (
                    PARTITION BY type, "key" ORDER BY load_seq DESC
                ) = 1
            )
            SELECT type, "key", title, 0 AS is_public
            FROM merged ORDER BY CAST("key" AS BIGINT) ASC LIMIT 100
        """,
        "agg_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "join_topk_orders": """
            SELECT l_orderkey,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "search_bm25_topk": _search_oracle(
            [
                ("t_spark", _term_hits("term = 'spark'")),
                ("t_join", _term_hits("term = 'join'")),
            ],
            'SELECT type, "key" FROM t_spark INTERSECT SELECT type, "key" FROM t_join',
        ),
        "search_not": _search_oracle(
            [
                ("t_window", _term_hits("term = 'window'")),
                ("t_spark", _term_hits("term = 'spark'")),
            ],
            'SELECT type, "key" FROM t_window EXCEPT SELECT type, "key" FROM t_spark',
        ),
        "search_or": _search_oracle(
            [
                ("t_filter", _term_hits("term = 'filter'")),
                ("t_window", _term_hits("term = 'window'")),
            ],
            'SELECT type, "key" FROM t_filter UNION SELECT type, "key" FROM t_window',
        ),
        "search_phrase": _search_oracle(
            [("ph", _phrase2_hits("batch", "stream"))],
            'SELECT type, "key" FROM ph',
        ),
        "search_prefix": _search_oracle(
            [("t_pre", _term_hits("term LIKE 'wind%'"))],
            'SELECT type, "key" FROM t_pre',
        ),
        "search_escape_fallback": _search_oracle(
            [("t_spark", _term_hits("term = 'spark'"))],
            'SELECT type, "key" FROM t_spark',
        ),
        "search_filtered": _search_oracle(
            [("t_spark", _term_hits("term = 'spark'"))],
            'SELECT type, "key" FROM t_spark',
            extra_where="WHERE si.category = 1 AND si.is_public = 1",
        ),
    }
