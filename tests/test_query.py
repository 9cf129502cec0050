"""Timeline / filter / facet semantics (SURVEY §2 B3-B4, D1-D4, F2-F4)."""

from dogsheep_beta_spark.plans.query import QueryPlan, timeline_query, compile_plan
from dogsheep_beta_spark.operators import facets as facet_ops
from dogsheep_beta_spark.schema import categories_df


def keys(df):
    return [f"{r['type'].split('.')[0]}:{r['key']}" for r in df.collect()]


def test_timeline_order(plugin_index):
    # FIXTURES.md §5: timestamp desc; the two rows sharing
    # 2020-08-01T00:05:02 tie-break deterministically on (type, key).
    out = timeline_query(plugin_index, QueryPlan())
    got = [(r["timestamp"], r["key"]) for r in out.collect()]
    assert [t for t, _ in got] == sorted([t for t, _ in got], reverse=True)
    assert len(got) == 4


def test_timeline_lexicographic_timestamps(spark):
    # F4 gotcha: 'T' (0x54) sorts AFTER ' ' (0x20); string order, not
    # timestamp order, must be reproduced.
    from dogsheep_beta_spark.indexer import build_search_index

    spark.createDataFrame(
        [(1, "2020-08-01T00:05:02"), (2, "2020-08-01 23:59:59")],
        "id int, ts string",
    ).createOrReplaceTempView("tsrc")
    idx = build_search_index(
        spark, {"d": {"r": {"sql": "select id as key, ts as timestamp from tsrc"}}}
    )
    out = timeline_query(idx, QueryPlan())
    # "2020-08-01T..." > "2020-08-01 23:59:59" lexicographically
    assert [r["key"] for r in out.collect()] == ["1", "2"]


def test_equality_and_date_filters(plugin_index):
    q = QueryPlan(is_public=1)
    out = timeline_query(plugin_index, q)
    assert all(r["is_public"] == 1 for r in out.collect())

    q = QueryPlan(date="2020-08-01")
    out = timeline_query(plugin_index, q)
    assert sorted(r["timestamp"] for r in out.collect()) == [
        "2020-08-01T00:05:02",
        "2020-08-01T00:05:02",
    ]


def test_sort_overrides(plugin_index):
    newest = timeline_query(plugin_index, QueryPlan(sort="newest"))
    oldest = timeline_query(plugin_index, QueryPlan(sort="oldest"))
    ts_new = [r["timestamp"] for r in newest.collect()]
    ts_old = [r["timestamp"] for r in oldest.collect()]
    assert ts_new == sorted(ts_new, reverse=True)
    assert ts_old == sorted(ts_old)


def test_count_and_facets(plugin_index, spark):
    res = compile_plan(plugin_index, QueryPlan())
    assert facet_ops.filtered_count(res.filtered) == 4

    type_facet = {r["value"]: r["count"] for r in res.facets["type"].collect()}
    assert type_facet == {"emails.db/emails": 2, "github.db/commits": 2}

    is_public_facet = {r["value"]: r["count"] for r in res.facets["is_public"].collect()}
    assert is_public_facet == {0: 2, 1: 2}

    date_facet = {str(r["value"]): r["count"] for r in res.facets["timestamp"].collect()}
    assert date_facet == {"2020-08-01": 2, "2020-08-02": 2}


def test_category_facet_labels(plugin_index, spark):
    # C4: FK label expansion via broadcast join — facet shows "created".
    res = compile_plan(plugin_index, QueryPlan())
    labeled = facet_ops.facet_with_labels(res.facets["category"], categories_df(spark))
    rows = {r["label"]: r["count"] for r in labeled.collect() if r["value"] is not None}
    assert rows == {"created": 2}


def test_search_and_facets_share_one_filtered_set(plugin_index):
    """Intentional deviation from the reference, pinned.

    The reference runs search and facets as two separate Datasette
    calls with DIVERGENT error fallbacks: the facet call retries
    without ``_searchmode=raw`` on any non-200
    (/root/reference/dogsheep_beta/__init__.py:241-244), while the
    search call falls back per-query — so for a query that errors only
    in raw mode the two paths can disagree about which docs were
    matched.  This engine deliberately collapses both onto ONE
    ``filtered`` DataFrame (plans/query.py:compile_plan), so the facet
    counts always sum over exactly the docs the search returned — for
    every query, including ones that take the escape fallback.
    """
    from dogsheep_beta_spark.plans.search import search_query

    # "#dogfest" is a ParseError → escape fallback (the class of query
    # where the reference's two paths could diverge).
    res = search_query(plugin_index, _fts(plugin_index), QueryPlan(q="#dogfest"))
    result_keys = {
        (r["type"], r["key"]) for r in res.results.select("type", "key").collect()
    }
    filtered_keys = {
        (r["type"], r["key"]) for r in res.filtered.select("type", "key").collect()
    }
    assert result_keys == filtered_keys  # same doc set feeds both
    type_facet = {r["value"]: r["count"] for r in res.facets["type"].collect()}
    assert sum(type_facet.values()) == len(filtered_keys)
    assert type_facet == {"emails.db/emails": 1}


def _fts(idx):
    from dogsheep_beta_spark.operators.fts_index import build_fts_index

    return build_fts_index(idx, mode="unicode61", stem=True)


def test_non_numeric_facet_args_match_nothing(spark, plugin_index):
    """?category=abc must render 0 results, not crash — the reference
    binds the raw string into SQLite whose affinity finds no rows."""
    from dogsheep_beta_spark.plans.query import QueryPlan, apply_filters

    out = apply_filters(plugin_index, QueryPlan(category="abc"))
    assert out.count() == 0
    out2 = apply_filters(plugin_index, QueryPlan(is_public=""))
    assert out2.count() == 0
    # SQLite numeric affinity: '1.0' and ' 1e0' compare numerically
    base = apply_filters(plugin_index, QueryPlan(category=1)).count()
    assert base > 0
    for v in ("1.0", " 1e0"):
        assert apply_filters(plugin_index, QueryPlan(category=v)).count() == base
    # fractional value matches no integer category (not a 500)
    assert apply_filters(plugin_index, QueryPlan(category="1.5")).count() == 0


def test_facets_built_lazily_and_exactly_once(plugin_index):
    """r12 request-path optimization contract (plans/query.py:LazyFacets):
    a request that never consumes facets must not pay their plan
    construction; a request that does must see the exact eager-build
    dict, built once no matter how many accesses."""
    from dogsheep_beta_spark.plans.query import LazyFacets, compile_plan

    calls = []

    def builder():
        calls.append(1)
        return {"a": 1, "b": 2}

    lf = LazyFacets(builder)
    assert calls == []  # construction alone builds nothing
    assert lf["a"] == 1 and "b" in lf and dict(lf.items()) == {"a": 1, "b": 2}
    assert len(lf) == 2 and lf.get("missing") is None
    assert calls == [1]  # every access path shares ONE build

    # r13 (ADVICE r12): the C fast-path idioms a dict SUBCLASS would
    # silently answer with empty internal storage must all see the
    # built mapping — LazyFacets is a Mapping wrapper, so dict(),
    # {**}, ==, and copy() route through keys()/__getitem__.
    want = {"a": 1, "b": 2}
    for fresh_probe in (
        lambda m: dict(m),
        lambda m: {**m},
        lambda m: m.copy(),
    ):
        fresh = LazyFacets(builder)
        assert fresh_probe(fresh) == want
    fresh = LazyFacets(builder)
    assert fresh == want and LazyFacets(builder) == LazyFacets(builder)
    assert calls[0] == 1  # (sanity: builder list still shared above)

    # through the real request path: compile_plan's facets must stay
    # unbuilt until consumed, then equal the eager column facets
    from dogsheep_beta_spark.operators import facets as facet_ops
    from dogsheep_beta_spark.plans.query import QueryPlan

    res = compile_plan(plugin_index, QueryPlan(), persist=False)
    assert isinstance(res.facets, LazyFacets)
    assert not res.facets._built  # untouched until a consumer asks
    got = {r["value"]: r["count"] for r in res.facets["type"].collect()}
    want_df = facet_ops.column_facet(res.filtered, "type", 30)
    want = {r["value"]: r["count"] for r in want_df.collect()}
    assert got == want and res.facets._built
