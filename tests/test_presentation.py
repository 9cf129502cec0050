"""Hydration (C3/J2) + presentation (J1/H4-H6/H10) — behaviors modeled
on the reference's process_results / facet machinery
(__init__.py:149-190, 246-257; tests/test_plugin.py)."""

import pytest
from pyspark.sql import functions as F

from dogsheep_beta_spark.plans.hydrate import (
    hydrate_join,
    hydrate_results,
    rewrite_display_sql,
)
from dogsheep_beta_spark import presentation as pres


# ---------------------------------------------------------------------------
# hydration
# ---------------------------------------------------------------------------


def test_rewrite_display_sql_in_pushdown():
    sql, col = rewrite_display_sql(
        "select * from emails where id = :key", ["1", "7"]
    )
    assert col == "id"
    assert "IN ('1', '7')" in sql
    assert ":key" not in sql


def test_rewrite_display_sql_q_param():
    sql, _ = rewrite_display_sql(
        "select *, :q as q from emails where emails.id = :key", ["1"], q="dog's"
    )
    assert "'dog''s' as q" in sql


def test_rewrite_display_sql_requires_key():
    with pytest.raises(ValueError):
        rewrite_display_sql("select * from emails", ["1"])


def test_hydrate_results_batches_by_type(spark):
    spark.createDataFrame(
        [(1, "a@x.com", "Hey"), (2, "b@x.com", "Yo")],
        "id int, from_ string, subject string",
    ).createOrReplaceTempView("emails")
    rows = [
        {"type": "emails.db/emails", "key": "1"},
        {"type": "emails.db/emails", "key": "2"},
        {"type": "other.db/t", "key": "9"},  # no display_sql -> None
    ]
    out = hydrate_results(
        spark, rows, {"emails.db/emails": "select * from emails where id = :key"}
    )
    assert out[0]["display"]["from_"] == "a@x.com"
    assert out[1]["display"]["subject"] == "Yo"
    assert out[2]["display"] is None


def test_hydrate_join_broadcast(spark):
    results = spark.createDataFrame([("t", "1"), ("t", "3")], "type string, key string")
    view = spark.createDataFrame([(1, "x"), (2, "y")], "id int, payload string")
    got = {
        r["key"]: r["payload"]
        for r in hydrate_join(results, view, "id").collect()
    }
    assert got == {"1": "x", "3": None}  # left join keeps unmatched results


# ---------------------------------------------------------------------------
# presentation
# ---------------------------------------------------------------------------


def test_process_results_template_and_default():
    rows = [
        {"type": "a/t", "key": "1", "title": "T1", "display": {"name": "N"}},
        {"type": "b/u", "key": "2", "title": "<T2>"},
    ]
    out = pres.process_results(rows, {"a/t": "<p>{{ title }} by {{ display.name }}</p>"})
    assert out[0]["output"] == "<p>T1 by N</p>"
    # no template -> escaped <pre> JSON dump (H4/H5)
    assert out[1]["output"].startswith("<pre>")
    assert "&lt;T2&gt;" in out[1]["output"]


def test_process_results_autoescape():
    rows = [{"type": "a/t", "key": "1", "title": "<script>"}]
    out = pres.process_results(rows, {"a/t": "{{ title }}"})
    assert out[0]["output"] == "&lt;script&gt;"


def test_process_results_template_debug():
    rows = [{"type": "a/t", "key": "1"}]
    # undefined attribute access raises inside the template
    tpl = {"a/t": "{{ missing.attr }}"}
    with pytest.raises(Exception):
        pres.process_results(rows, tpl)
    out = pres.process_results(rows, tpl, template_debug=True)
    assert "border: 2px solid red" in out[0]["output"]


def test_intcomma():
    assert pres.intcomma(1234567) == "1,234,567"
    assert pres.intcomma(12) == "12"


def test_sort_links():
    # H10 sort links — page.py's other_sort_links is the single
    # (golden-pinned) implementation since round 6
    from dogsheep_beta_spark.page import other_sort_links

    links = other_sort_links({"q": "dogs", "sort": "newest"}, "dogs", "newest")
    by_label = {l["label"]: l for l in links}
    assert set(by_label) == {"relevance", "oldest"}  # current omitted
    assert "sort=oldest" in by_label["oldest"]["url"]
    assert "sort=" not in by_label["relevance"]["url"]  # default drops param
    # timeline mode (no q): no relevance link
    labels = [l["label"] for l in other_sort_links({}, "", "newest")]
    assert "relevance" not in labels


def test_facet_toggle_urls():
    from dogsheep_beta_spark.page import toggle_url

    args = {"q": "x", "category": "1", "_facet": "zzz"}
    on = toggle_url("category", "2", False, args, "x")
    off = toggle_url("category", "1", True, args, "x")
    assert "category=1" not in off  # toggling off removes it
    assert "category=2" in on  # toggling on adds it
    assert "_facet" not in on  # internal params stripped
    assert on.endswith("q=x")  # q re-appended LAST (reference parity)
