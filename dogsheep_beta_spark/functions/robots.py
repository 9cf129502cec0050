"""robots.txt compliance filtering (RFC 9309, the Robots Exclusion
Protocol) — the crawl-politeness pass a responsible web corpus runs
before (or while re-validating) ingestion.

Shape: robots.txt files are tiny (one per host) and the rule set for
a whole crawl fits in a broadcast; URLs are the 100 TB side.  So the
parse is driver-side Python (``parse_robots``, golden-tested against
the RFC's own examples), the rules become a small DataFrame
(``robots_rules_df``), and the filter is a broadcast join on host +
a per-URL longest-match argmax (``robots_filter``) — the URL table
never shuffles on anything but its own partitioning.

Matching semantics per RFC 9309 §2.2:

- group selection: the group whose ``User-agent`` token is the
  longest case-insensitive prefix of the caller's product token;
  ``*`` is the fallback group.
- rule matching: ``Allow``/``Disallow`` values are path prefixes
  with ``*`` (any chars) and ``$`` (end anchor) wildcards.
- decision: the MOST SPECIFIC match wins (longest rule in octets);
  at equal length Allow beats Disallow.  No match ⇒ allowed.
  An empty Disallow value matches nothing (allow-all idiom).

Rules compile to anchored regexes once, driver-side, with everything
except ``*``/``$`` literal-escaped — the same pattern string runs in
Spark (Java regex) and DuckDB (RE2), which keeps the declared query
strict-hash oracle-able.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def rule_to_regex(value: str) -> str:
    """RFC 9309 path pattern → anchored regex: literal-escape all
    regex metachars, then ``*`` → ``.*`` and a trailing ``$`` →
    end-anchor.  Prefix semantics ⇒ leading ``^``, no trailing
    anchor unless the rule had ``$``."""
    anchored_end = value.endswith("$")
    body = value[:-1] if anchored_end else value
    out = "^" + ".*".join(re.escape(part) for part in body.split("*"))
    return out + "$" if anchored_end else out


def parse_robots(text: str, agent: str = "*") -> list[tuple[bool, int, str]]:
    """One host's robots.txt → the applicable rule list for ``agent``:
    ``[(allow, rule_len, regex), ...]``.

    Groups are runs of ``User-agent`` lines followed by rules; the
    selected group is the longest user-agent token that is a prefix of
    ``agent`` (case-insensitive), with ``*`` as the zero-length
    fallback.  Empty Disallow values are dropped (they match
    nothing).  Unknown directives (Crawl-delay, Sitemap, ...) are
    ignored, comments stripped."""
    agent_l = agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_agent_run = True
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_agent_run:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(val.lower())
            in_agent_run = True
        elif key in ("allow", "disallow"):
            if cur_agents:
                in_agent_run = False
                if val:  # empty Disallow/Allow matches nothing
                    cur_rules.append((key == "allow", val))
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    best_len, best_rules = -1, []
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                cand = 0
            elif agent_l.startswith(a):
                cand = len(a)
            else:
                continue
            if cand > best_len:
                best_len, best_rules = cand, rules
    return [
        (allow, len(value), rule_to_regex(value))
        for allow, value in best_rules
    ]


def robots_rules_df(
    spark: SparkSession, robots_by_host: dict, agent: str = "*"
) -> DataFrame:
    """{host: robots.txt text} → broadcastable rules table
    ``(host, allow, rule_len, pattern)`` for ``agent``.  Hosts whose
    file yields no applicable rules get no rows (⇒ everything
    allowed, the no-match default).

    Built as a pure LITERAL plan (inline of struct literals), not a
    Python-RDD createDataFrame — the rules side must never cost a
    Python worker round-trip per evaluation."""
    rows = [
        (host, int(allow), rule_len, pattern)
        for host, text in sorted(robots_by_host.items())
        for allow, rule_len, pattern in parse_robots(text, agent)
    ]
    if not rows:
        return spark.range(0).select(
            F.lit("").alias("host"),
            F.lit(0).alias("allow"),
            F.lit(0).alias("rule_len"),
            F.lit("").alias("pattern"),
        )
    structs = [
        F.struct(
            F.lit(h).alias("host"),
            F.lit(a).alias("allow"),
            F.lit(l).alias("rule_len"),
            F.lit(p).alias("pattern"),
        )
        for h, a, l, p in rows
    ]
    return spark.range(1).select(F.inline(F.array(*structs)))


def robots_filter(
    urls: DataFrame, url_col: str, rules: DataFrame
) -> DataFrame:
    """Adds ``robots_allowed`` (int 0/1) per URL.

    host/path split is a map-side regex; candidates = broadcast join
    on host + regexp match; decision = longest-match argmax with
    Allow winning ties (one window over the candidate rows — bounded
    by rules-per-host, not corpus size); URLs with no matching rule
    (or no rules for their host) are allowed."""
    host = F.lower(
        F.regexp_extract(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1)
    )
    path = F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$", 1
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    base = (
        urls.withColumn("__uid", F.monotonically_increasing_id())
        .withColumn("__host", F.regexp_replace(host, r":\d+$", ""))
        .withColumn("__path", path)
    )
    cand = base.join(
        F.broadcast(rules), base["__host"] == rules["host"], "left"
    ).withColumn(
        "__match",
        F.when(
            F.col("pattern").isNotNull()
            & F.regexp_like(F.col("__path"), F.col("pattern")),
            1,
        ).otherwise(0),
    )
    w = Window.partitionBy("__uid").orderBy(
        F.desc("__match"), F.desc("rule_len"), F.desc("allow")
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            *urls.columns,
            F.when(F.col("__match") == 0, F.lit(1))
            .otherwise(F.col("allow"))
            .alias("robots_allowed"),
        )
    )
