"""robots.txt parsing + filtering (functions/robots.py) against the
RFC 9309 semantics: group selection, wildcard rules, longest-match
with Allow winning ties, no-match default."""

import pytest
from pyspark.sql import functions as F

from dogsheep_beta_spark.functions.robots import (
    parse_robots,
    robots_filter,
    robots_filter_join,
    robots_rules_df,
    rule_to_regex,
)

ROBOTS = """
# example file
User-agent: FancyBot
Disallow: /private/

User-agent: *
Allow: /public/
Disallow: /pub*
Disallow: /tmp$
Disallow:
Crawl-delay: 10
"""


def test_group_selection_prefers_longest_agent_prefix():
    fancy = parse_robots(ROBOTS, agent="fancybot/1.2")
    assert [(a, l) for a, l, _ in fancy] == [(False, 9)]
    star = parse_robots(ROBOTS, agent="otherbot")
    # empty Disallow dropped; 3 rules survive
    assert [(a, l) for a, l, _ in star] == [
        (True, 8), (False, 5), (False, 5)
    ]


def test_rule_to_regex_wildcards():
    import re

    assert re.match(rule_to_regex("/pub*"), "/public/x")
    assert re.match(rule_to_regex("/tmp$"), "/tmp")
    assert not re.match(rule_to_regex("/tmp$"), "/tmp/x")
    assert re.match(rule_to_regex("/a*b$"), "/aXXXb")
    # regex metachars in paths are literal
    assert re.match(rule_to_regex("/a.b"), "/a.b")
    assert not re.match(rule_to_regex("/a.b"), "/aXb")


def test_robots_filter_longest_match_and_defaults(spark):
    urls = spark.createDataFrame(
        [
            ("http://ex.com/public/page",),   # Allow /public/ (8) beats /pub* (4)
            ("http://ex.com/pubx",),          # only /pub* matches -> blocked
            ("http://ex.com/tmp",),           # /tmp$ -> blocked
            ("http://ex.com/tmp/file",),      # $ anchor does not match -> allowed
            ("http://ex.com/other",),         # no match -> allowed
            ("http://other.com/pubx",),       # no rules for host -> allowed
            ("http://EX.com:8080/pubx",),     # host casefold + port strip
        ],
        "url string",
    )
    got = {
        r.url: r.robots_allowed
        for r in robots_filter(
            urls, "url", {"ex.com": ROBOTS}, agent="otherbot"
        ).collect()
    }
    assert got == {
        "http://ex.com/public/page": 1,
        "http://ex.com/pubx": 0,
        "http://ex.com/tmp": 0,
        "http://ex.com/tmp/file": 1,
        "http://ex.com/other": 1,
        "http://other.com/pubx": 1,
        "http://EX.com:8080/pubx": 0,
    }


def test_robots_filter_keeps_duplicate_rows(spark):
    urls = spark.createDataFrame(
        [("http://ex.com/pubx",)] * 3, "url string"
    )
    out = robots_filter(urls, "url", {"ex.com": ROBOTS}, agent="x")
    assert out.count() == 3  # one verdict per input row, dups preserved


def test_allow_wins_equal_length_tie(spark):
    txt = "User-agent: *\nAllow: /dir/\nDisallow: /dir/"
    urls = spark.createDataFrame([("https://h.io/dir/x",)], "url string")
    [r] = robots_filter(urls, "url", {"h.io": txt}).collect()
    assert r.robots_allowed == 1


def test_split_groups_for_same_agent_combine():
    """RFC 9309 §2.2.1 regression: two separate 'User-agent: *' groups
    both apply — dropping the later one un-disallows its paths."""
    txt = (
        "User-agent: *\nDisallow: /private/\n\n"
        "User-agent: googlebot\nDisallow: /g/\n\n"
        "User-agent: *\nDisallow: /tmp/\n"
    )
    rules = parse_robots(txt, "mybot")
    prefixes = sorted(pat for _, _, pat in rules)
    assert prefixes == ["^/private/", "^/tmp/"]


def test_robots_filter_is_map_only(spark):
    urls = spark.createDataFrame([("http://ex.com/pubx",)], "url string")
    out = robots_filter(urls, "url", {"ex.com": ROBOTS})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_join_variant_agrees_and_guards_reserved_names(spark):
    urls = spark.createDataFrame(
        [
            ("http://ex.com/public/page",),
            ("http://ex.com/pubx",),
            ("http://ex.com/tmp",),
            ("http://other.com/pubx",),
        ],
        "url string",
    )
    rules = robots_rules_df(spark, {"ex.com": ROBOTS}, agent="otherbot")
    a = {
        r.url: r.robots_allowed
        for r in robots_filter_join(urls, "url", rules).collect()
    }
    b = {
        r.url: r.robots_allowed
        for r in robots_filter(
            urls, "url", {"ex.com": ROBOTS}, agent="otherbot"
        ).collect()
    }
    assert a == b
    bad = urls.withColumnRenamed("url", "u").withColumn("host", F.lit("x"))
    with pytest.raises(ValueError, match="host"):
        robots_filter_join(bad, "u", rules)


def test_host_keys_normalized_and_ipv6_ports_safe(spark):
    """Rule keys get the SAME lower+port-strip normalization as the
    URL side (a caller keying 'Example.com:8080' silently never
    matched, ADVICE r6), and the port strip is anchored so IPv6
    literals keep their final group."""
    from dogsheep_beta_spark.functions.robots import _norm_host_py

    assert _norm_host_py("Example.com:8080") == "example.com"
    assert _norm_host_py("EXAMPLE.com") == "example.com"
    assert _norm_host_py("2001:db8::1") == "2001:db8::1"  # not chopped
    assert _norm_host_py("[::1]:8080") == "[::1]"
    assert _norm_host_py("[2001:db8::1]") == "[2001:db8::1]"

    urls = spark.createDataFrame(
        [
            ("http://ex.com:8080/tmp",),     # port URL vs ported key
            ("http://ex.com:8080/public/page",),
        ],
        "url string",
    )
    got = {
        r.url: r.robots_allowed
        for r in robots_filter(urls, "url", {"EX.com:8080": ROBOTS}).collect()
    }
    assert got["http://ex.com:8080/tmp"] == 0
    assert got["http://ex.com:8080/public/page"] == 1
