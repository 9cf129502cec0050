"""robots.txt compliance filtering (RFC 9309, the Robots Exclusion
Protocol) — the crawl-politeness pass a responsible web corpus runs
before (or while re-validating) ingestion.

Shape: robots.txt files are tiny (one per host) and the rule set for
a whole crawl fits in a broadcast; URLs are the 100 TB side.  So the
parse is driver-side Python (``parse_robots``), and the filter is
MAP-ONLY: the rules become one literal map expression and each URL
decides its verdict with a higher-order longest-match argmax
(``robots_filter``) — the URL table genuinely never moves.  For rule
sets too large for a literal there is a broadcast-join variant
(``robots_filter_join`` over ``robots_rules_df``) that costs one
bounded candidate window.

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
    applicable rules are those of EVERY group carrying the winning
    user-agent token — the longest case-insensitive prefix of
    ``agent``, with ``*`` as the zero-length fallback.  RFC 9309
    §2.2.1 requires combining groups that name the same product token
    (two separate ``User-agent: *`` groups both apply; selecting only
    one silently un-disallows the other's paths).  Empty Disallow
    values are dropped (they match nothing).  Unknown directives
    (Crawl-delay, Sitemap, ...) are ignored, comments stripped."""
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

    def match_len(a: str):
        if a == "*":
            return 0
        return len(a) if agent_l.startswith(a) else None

    lens = [
        m
        for agents, _ in groups
        for a in agents
        if (m := match_len(a)) is not None
    ]
    if not lens:
        return []
    best_len = max(lens)
    best_rules = [
        rule
        for agents, rules in groups
        if any(match_len(a) == best_len for a in agents)
        for rule in rules
    ]
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


# host normalization shared by the rule keys (Python) and the URL
# column (Spark): lowercase + strip an explicit :port — ANCHORED so a
# bracketless IPv6 literal ('2001:db8::1') keeps its final group, and
# bracketed-IPv6-with-port ('[::1]:8080') strips only the port.
_PORT_STRIP_RE = r"^((?:\[[^\]]*\])|(?:[^:]+)):\d+$"


def _norm_host_py(h: str) -> str:
    import re

    h = h.strip().lower()
    m = re.match(_PORT_STRIP_RE, h)
    return m.group(1) if m else h


def robots_filter(
    urls: DataFrame,
    url_col: str,
    robots_by_host: dict,
    agent: str = "*",
) -> DataFrame:
    """Adds ``robots_allowed`` (int 0/1) per URL — MAP-ONLY.

    The parsed rules become one literal ``map<host, array<struct>>``
    expression; each URL looks its host's rules up, filters matches
    with a higher-order lambda, and takes the (rule_len, allow)
    struct-max — RFC longest-match with Allow winning ties.  Zero
    joins, zero shuffles: the 100 TB URL side never moves (the window
    variant this replaced shuffled the whole table on a row id).
    URLs with no matching rule, no rules for their host, or no host
    at all are allowed.

    The literal map is the right shape up to ~10⁴ rules (whole-crawl
    politeness sets usually fit: one host's rules are a handful).
    Beyond that, use ``robots_filter_join`` with a rules DataFrame.
    """
    from dogsheep_beta_spark.functions.urls import url_host, url_path_query

    per_host: dict = {}
    for host, text in sorted(robots_by_host.items()):
        rules = parse_robots(text, agent)
        if rules:
            # the SAME lower+port-strip normalization the URL side
            # gets below — a caller keying 'Example.com:8080' used to
            # silently never match any URL (ADVICE r6)
            per_host[_norm_host_py(host)] = rules
    if not per_host:
        return urls.withColumn("robots_allowed", F.lit(1))
    rules_map = F.map_from_arrays(
        F.array(*[F.lit(h) for h in per_host]),
        F.array(
            *[
                F.array(
                    *[
                        F.struct(
                            F.lit(int(allow)).alias("allow"),
                            F.lit(rule_len).alias("rule_len"),
                            F.lit(pattern).alias("pattern"),
                        )
                        for allow, rule_len, pattern in rules
                    ]
                )
                for rules in per_host.values()
            ]
        ),
    )
    host = F.regexp_replace(
        F.lower(url_host(F.col(url_col))), _PORT_STRIP_RE, "$1"
    )
    path = url_path_query(F.col(url_col))
    matched = F.filter(
        F.coalesce(
            F.element_at(rules_map, host),
            F.array().cast(
                "array<struct<allow:int,rule_len:int,pattern:string>>"
            ),
        ),
        lambda r: F.regexp_like(path, r["pattern"]),
    )
    best = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(
                r["rule_len"].alias("rule_len"), r["allow"].alias("allow")
            ),
        )
    )
    return urls.withColumn(
        "robots_allowed",
        F.when(F.size(matched) == 0, F.lit(1)).otherwise(best["allow"]),
    )


def robots_filter_join(
    urls: DataFrame, url_col: str, rules: DataFrame
) -> DataFrame:
    """The many-hosts variant of ``robots_filter``: same verdicts, but
    the rule table is a DataFrame (``robots_rules_df`` or a real
    crawl-wide store) broadcast-joined on host, with the longest-match
    argmax as one bounded window.  Costs one shuffle of the candidate
    rows on a synthetic row id — use the map-only ``robots_filter``
    whenever the rule set fits a literal.

    ``urls`` may not contain the reserved working columns."""
    from dogsheep_beta_spark.functions.urls import url_host, url_path_query

    for reserved in (
        "host", "allow", "rule_len", "pattern", "robots_allowed",
        "__uid", "__host", "__path", "__match", "__rn",
    ):
        if reserved in urls.columns:
            raise ValueError(
                f"robots_filter_join: urls may not contain a column "
                f"named {reserved!r}"
            )
    host = F.lower(url_host(F.col(url_col)))
    base = (
        urls.withColumn("__uid", F.monotonically_increasing_id())
        .withColumn("__host", F.regexp_replace(host, r":\d+$", ""))
        .withColumn("__path", url_path_query(F.col(url_col)))
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
