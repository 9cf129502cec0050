"""MATCH query-language parser + planner (SURVEY.md §2 B5/B6/C5, §4).

The reference sends the user's q to SQLite FTS5 (``search_index_fts
match :query``, __init__.py:131) and, if FTS5 rejects the syntax,
re-runs with every whitespace token double-quoted
(``escape_fts``, __init__.py:141-145) — error-driven re-plan whose
observable behavior is pinned by tests/test_plugin.py:119-149:

    "things NOT email"  → boolean query (anti-join semantics)
    "#dogfest"          → syntax error → escaped → matches token dogfest
    "github-to-sqlite"  → syntax error → escaped → 3-token phrase → no hit

This module is the custom piece Catalyst can't provide (SURVEY §4): a
small parser producing an AST, and a compiler emitting DataFrame plans
over the postings index:

    term          → filter postings on term        (partition-prunable)
    prefix*       → startswith on the term column
    "a b c"       → per-field positional adjacency (array_intersect of
                    shifted position lists — pure JVM expressions)
    implicit AND  → inner joins of doc-sets
    OR            → union distinct
    a NOT b       → left_anti join

Grammar (FTS5 subset; operators must be uppercase, like FTS5; pinned
against real FTS5 by the r11 grammar-random differential fuzz):
    query   := or_expr
    or_expr := and_expr ('OR' and_expr)*
    and_expr:= not_expr ('AND' not_expr)*
    not_expr:= juxta ('NOT' juxta)*
    juxta   := primary primary*        -- implicit AND, binds TIGHTEST;
                                          only joins non-paren primaries
    primary := '(' query ')' | colspec primary | 'NEAR' '(' phrase+ [',' N] ')'
             | '"' ... '"' ['*'] | ['^'] word ['*']
    colspec := ['-'] (word | '{' word+ '}') ':'

Column filters (FTS5 ``title:term``, ``{title search_1}:term``,
``-title:term``) restrict every phrase under them to the named indexed
columns — both for matching AND for the BM25 tf (FTS5's phrase
iterators only visit filtered columns).  An unknown column name is a
syntax error (FTS5 "no such column") → escape fallback.

NEAR(p1 p2 ..., N) matches docs where one instance per phrase can be
chosen in ONE field (repeated phrases may share an instance) such
that EVERY PAIR of chosen instances has <= N separating tokens —
equivalently max(first) - min(last) - 1 <= N over the assignment
(FTS5's rule, adjudicated by the r11 grammar differential: the
previous outermost-span reading wrongly matched NEAR(a b c, 0) on
"a b c").  N defaults to 10, like FTS5.

Barewords are FTS5's: ASCII alphanumerics, ``_``, and any codepoint
>= U+0080.  Everything else (``# - ` { | } ~`` …) outside
operator/quote positions raises ParseError → the caller escapes and
recompiles (same two-phase flow as the reference).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ParseError(Exception):
    """Invalid MATCH syntax — triggers the escape_fts fallback (B6)."""


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class Phrase:
    tokens: list[str]
    prefix: bool = False
    initial: bool = False  # ^word — must start the field
    fields: tuple[str, ...] | None = None  # column filter; None = all


@dataclass
class Near:
    """NEAR(p1 p2 ..., n) — proximity group (FTS5 NEAR operator)."""

    phrases: list[Phrase]
    n: int = 10  # FTS5 default distance


@dataclass
class And:
    items: list


@dataclass
class Or:
    items: list


@dataclass
class Not:
    left: object
    right: object


# ---------------------------------------------------------------------------
# Lexer + recursive-descent parser
# ---------------------------------------------------------------------------

# FTS5 bareword chars: ASCII alphanumerics, underscore, and codepoints
# >= U+0080.  ASCII punctuation 0x60-0x7E (` { | } ~) are NOT word
# chars; they lex as syntax (or error) exactly like FTS5 unicode61.
_WORD = re.compile(r"[A-Za-z0-9_-￿]+")
_WS = re.compile(r"\s+")


# Punctuation with syntactic meaning.  Anything else non-word raises
# ParseError -> escape fallback (FTS5 parity: ` { | } ~ # etc. are
# syntax errors, pinned by tests/test_plugin.py:131-139 semantics).
_PUNCT = {
    "(": "LP",
    ")": "RP",
    "^": "CARET",
    "*": "STAR",
    "{": "LBRACE",
    "}": "RBRACE",
    ":": "COLON",
    ",": "COMMA",
    "-": "MINUS",
}


def _word_re(word_chars: str):
    """Bareword regex, widened by the index tokenizer's ``tokenchars``
    (FTS5: characters promoted to token chars are legal in barewords —
    ``#dogfest`` parses instead of falling back when the index was
    built with ``tokenchars '#'``)."""
    if not word_chars:
        return _WORD
    extra = "".join("\\" + c if c in "\\^]-[" else c for c in word_chars)
    return re.compile("[A-Za-z0-9_" + extra + "\u0080-\uffff]+")


def _lex(q: str, word_chars: str = "") -> list[tuple[str, str]]:
    word_re = _word_re(word_chars)
    out = []
    i, n = 0, len(q)
    while i < n:
        m = _WS.match(q, i)
        if m:
            i = m.end()
            continue
        ch = q[i]
        if ch in _PUNCT and ch not in word_chars:
            out.append((_PUNCT[ch], ch))
            i += 1
        elif ch == '"':
            j = q.find('"', i + 1)
            if j < 0:
                raise ParseError("unterminated phrase")
            out.append(("QUOTED", q[i + 1 : j]))
            i = j + 1
        else:
            m = word_re.match(q, i)
            if not m:
                raise ParseError(f"unexpected character {ch!r} at {i}")
            word = m.group(0)
            if word in ("AND", "OR", "NOT"):
                out.append((word, word))
            else:
                out.append(("WORD", word))
            i = m.end()
    return out


def _restrict_fields(node, fields: tuple[str, ...]):
    """Apply a column filter to every phrase under ``node`` (nested
    filters intersect, like FTS5)."""
    if isinstance(node, Phrase):
        node.fields = (
            fields
            if node.fields is None
            else tuple(f for f in node.fields if f in fields)
        )
    elif isinstance(node, Near):
        for p in node.phrases:
            _restrict_fields(p, fields)
    elif isinstance(node, (And, Or)):
        for it in node.items:
            _restrict_fields(it, fields)
    elif isinstance(node, Not):
        _restrict_fields(node.left, fields)
        _restrict_fields(node.right, fields)


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], analyze, columns):
        self.toks = tokens
        self.pos = 0
        self.analyze = analyze  # str -> list[str] (tokenize + optional stem)
        self.columns = tuple(columns)  # indexed columns (colspec targets)
        self.last_primary_paren = False  # see and_expr / primary

    def peek(self):
        return self.toks[self.pos][0] if self.pos < len(self.toks) else None

    def peek2(self):
        return self.toks[self.pos + 1][0] if self.pos + 1 < len(self.toks) else None

    def take(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def parse(self):
        node = self.or_expr()
        if self.pos != len(self.toks):
            raise ParseError(f"trailing tokens at {self.pos}")
        return node

    def or_expr(self):
        items = [self.and_expr()]
        while self.peek() == "OR":
            self.take()
            items.append(self.and_expr())
        return items[0] if len(items) == 1 else Or(items)

    def and_expr(self):
        items = [self.not_expr()]
        while self.peek() == "AND":
            self.take()
            items.append(self.not_expr())
        return items[0] if len(items) == 1 else And(items)

    def juxta(self):
        """Implicit-AND chain (juxtaposition).  Two FTS5 rules the r11
        grammar differential forced, both verified against FTS5 itself:

        - juxtaposition binds TIGHTER than NOT/AND/OR — ``a NOT b c``
          is ``a NOT (b AND c)`` (the old parser's
          ``(a NOT b) AND c`` diverged on any doc with a and b but
          not c);
        - it only joins cnearsets (phrases / NEAR groups, optionally
          column-filtered): a parenthesized expression on EITHER side
          must be joined explicitly — ``(a) b``, ``b (a)``,
          ``title:(a) b`` are syntax errors while ``NEAR(a b) c`` is
          fine."""
        items = [self.primary()]
        while self.peek() in ("LP", "WORD", "QUOTED", "CARET", "LBRACE", "MINUS"):
            if self.last_primary_paren or self._implicit_operand_is_paren():
                raise ParseError(
                    "parenthesized expressions must be joined with "
                    "AND/OR/NOT"
                )
            items.append(self.primary())
        # FTS5 drops token-less phrases ("", "  ", "-" — any
        # decoration) from a juxtaposition chain: `alpha "" beta` is
        # `alpha beta`.  Only when NOTHING survives does the chain
        # become a never-match (standalone `""`) — adjudicated by the
        # r11 grammar differential.
        kept = [
            it
            for it in items
            if not (isinstance(it, Phrase) and not it.tokens)
        ]
        items = kept or [items[0]]
        return items[0] if len(items) == 1 else And(items)

    def _colspec_operand(self):
        """The primary a column filter applies to: a phrase, NEAR
        group, caret-phrase or parenthesized expression — NOT another
        column filter.  FTS5 rejects chained filters
        (``title:search_1:beta``, ``title:-search_1:beta``, braced
        variants) as syntax errors, and the reference would therefore
        route them through the escape fallback; accepting them here
        produced a different docset (r11 code review).  Forbidding the
        chain also keeps `_implicit_operand_is_paren`'s single-colspec
        lookahead exact."""
        kind = self.peek()
        if kind == "MINUS" or kind == "LBRACE" or (
            kind == "WORD" and self.peek2() == "COLON"
        ):
            raise ParseError("column filter cannot apply to another")
        return self.primary()

    def _implicit_operand_is_paren(self) -> bool:
        """True iff the tokens at the cursor begin a parenthesized
        expression (optionally behind a column filter) — the operand
        shape juxtaposition cannot precede.  NEAR(…) is a WORD + LP
        and correctly classifies False."""
        toks, i = self.toks, self.pos

        def at(j):
            return toks[j][0] if j < len(toks) else None

        if at(i) == "MINUS":
            i += 1
        if at(i) == "WORD" and at(i + 1) == "COLON":
            i += 2
        elif at(i) == "LBRACE":
            j = i + 1
            while at(j) == "WORD":
                j += 1
            if at(j) == "RBRACE" and at(j + 1) == "COLON":
                i = j + 2
            else:
                return False
        return at(i) == "LP"

    def not_expr(self):
        node = self.juxta()
        while self.peek() == "NOT":
            self.take()
            node = Not(node, self.juxta())
        return node

    def _colset(self) -> tuple[str, ...]:
        """Parse ``col`` or ``{col col ...}`` followed by ':'; validate
        names against the indexed columns (FTS5: unknown column is a
        syntax error -> escape fallback)."""
        names = []
        if self.peek() == "LBRACE":
            self.take()
            while self.peek() == "WORD":
                names.append(self.take()[1])
            if self.peek() != "RBRACE":
                raise ParseError("expected } in column list")
            self.take()
        elif self.peek() == "WORD":
            names.append(self.take()[1])
        if not names:
            raise ParseError("expected column name")
        if self.peek() != "COLON":
            raise ParseError("expected : after column list")
        self.take()
        fields = []
        for nm in names:
            canon = next(
                (c for c in self.columns if c.lower() == nm.lower()), None
            )
            if canon is None:
                raise ParseError(f"no such column: {nm}")
            if canon not in fields:
                fields.append(canon)
        return tuple(fields)

    def primary(self):
        kind = self.peek()
        # juxtaposition legality (see and_expr): a primary is "paren"
        # if its OUTERMOST shape is (…) — directly or behind a column
        # filter, whose branches recurse and inherit the inner flag.
        # Every non-paren branch leaves the False set here.
        self.last_primary_paren = False
        if kind == "LP":
            self.take()
            node = self.or_expr()
            if self.peek() != "RP":
                raise ParseError("expected )")
            self.take()
            self.last_primary_paren = True
            return node
        if kind == "MINUS":
            # -col: / -{...}: — all indexed columns EXCEPT the named
            # ones.  Excluding EVERY column is valid FTS5 (not a syntax
            # error): the phrase simply can never match — found by the
            # r11 grammar differential (`-{title search_1}:x` returns
            # empty from FTS5; raising here routed it to the escape
            # fallback, which would have MATCHED the tokens instead).
            # The compiler maps fields=() to limit(0).
            self.take()
            named = self._colset()
            fields = tuple(c for c in self.columns if c not in named)
            node = self._colspec_operand()
            _restrict_fields(node, fields)
            return node
        if kind == "LBRACE" or (kind == "WORD" and self.peek2() == "COLON"):
            fields = self._colset()
            node = self._colspec_operand()
            _restrict_fields(node, fields)
            return node
        if (
            kind == "WORD"
            and self.toks[self.pos][1] == "NEAR"
            and self.peek2() == "LP"
        ):
            return self.near_group()
        if kind == "CARET":
            self.take()
            if self.peek() not in ("WORD", "QUOTED"):
                raise ParseError("expected term after ^")
            node = self.primary()
            if not isinstance(node, Phrase):
                # FTS5 rejects '^' before anything but a phrase (e.g.
                # ^NEAR(...)); setting .initial on a Near node would be
                # silently ignored — raise so the escape fallback takes
                # over, matching the reference's behavior for the input
                raise ParseError("^ must be followed by a phrase")
            node.initial = True
            return node
        if kind == "QUOTED":
            _, text = self.take()
            prefix = False
            if self.peek() == "STAR":
                self.take()
                prefix = True
            return Phrase(self.analyze(text), prefix=prefix)
        if kind == "WORD":
            _, text = self.take()
            prefix = False
            if self.peek() == "STAR":
                self.take()
                prefix = True
            return Phrase(self.analyze(text), prefix=prefix)
        raise ParseError(f"unexpected token {kind}")

    def near_group(self):
        """NEAR ( phrase+ [, N] ) — only phrases allowed inside."""
        self.take()  # NEAR
        self.take()  # (
        phrases = []
        while self.peek() in ("WORD", "QUOTED", "CARET"):
            node = self.primary()
            if not isinstance(node, Phrase) or node.fields is not None:
                raise ParseError("NEAR accepts only phrases")
            phrases.append(node)
        if not phrases:
            raise ParseError("empty NEAR group")
        n = 10  # FTS5 default
        if self.peek() == "COMMA":
            self.take()
            if self.peek() != "WORD" or not self.toks[self.pos][1].isdigit():
                raise ParseError("NEAR distance must be an integer")
            n = int(self.take()[1])
        if self.peek() != "RP":
            raise ParseError("expected ) to close NEAR")
        self.take()
        # FTS5 drops token-less phrases ("", "  ", "-") from the group;
        # if nothing survives, the group can never match (r11 grammar
        # differential — NEAR(alpha "", 0) ≡ NEAR(alpha, 0) while
        # NEAR("" "", 0) matches nothing)
        kept = [p for p in phrases if p.tokens]
        if not kept:
            return Phrase([])
        return Near(kept, n)


DEFAULT_COLUMNS = ("title", "search_1")  # the two indexed fields (A9)


def parse_match(
    q: str, analyze, columns=DEFAULT_COLUMNS, word_chars: str = ""
) -> object:
    """Parse a MATCH query; raise ParseError on FTS5-invalid syntax.
    ``word_chars`` widens the bareword charset with the index
    tokenizer's promoted tokenchars (FTS5 parity — see _word_re)."""
    toks = _lex(q, word_chars)
    if not toks:
        raise ParseError("empty query")
    return _Parser(toks, analyze, columns).parse()


def escape_match(q: str, analyze) -> object:
    """The escape_fts fallback (H8): every whitespace token becomes a
    quoted phrase, disabling all operators (__init__.py:112,144)."""
    phrases = [Phrase(analyze(tok)) for tok in q.split()]
    phrases = [p for p in phrases if p.tokens]
    return And(phrases) if phrases else And([])


# ---------------------------------------------------------------------------
# Compiler: AST → DataFrame plans over the postings index
# ---------------------------------------------------------------------------


def collect_phrases(node) -> list[Phrase]:
    """All phrases in the tree — FTS5 scores every phrase that occurs in
    a matching row, regardless of its position in the boolean tree.
    Phrases inside NEAR groups score like ordinary phrases (their tf/df
    are unconstrained by the proximity test, matching FTS5's per-phrase
    statistics)."""
    if isinstance(node, Phrase):
        return [node]
    if isinstance(node, Near):
        return list(node.phrases)
    if isinstance(node, (And, Or)):
        return [p for it in node.items for p in collect_phrases(it)]
    if isinstance(node, Not):
        return collect_phrases(node.left) + collect_phrases(node.right)
    return []


def _scoped_postings(fts, phrase: Phrase) -> DataFrame:
    """Postings restricted to the phrase's column filter (B5 ``col:``)
    and — when the index is at rest hive-partitioned by a term key
    (write_fts_index ``term_partitions=N`` / ``term_scheme="prefix"``)
    — to the union of the phrase's term partitions, so the scan carries
    PartitionFilters and touches only those directories.

    Hash scheme: exact terms prune to their md5 buckets; ``foo*`` is
    unboundable under hashing and skips the cut.  Prefix scheme
    (term_pfx = "p" + term[:2], lexicographic): exact terms prune by
    equality, and prefix phrases prune too — an equality on the
    first-2-chars key when the typed prefix has ≥ 2 chars, a StartsWith
    (still a partition filter: a directory-set cut) for a single-char
    prefix."""
    p = fts.postings
    if getattr(fts, "term_scheme", "hash") == "prefix" and phrase.tokens:
        from dogsheep_beta_spark.operators.fts_index import term_prefix_py

        full = phrase.tokens[:-1] if phrase.prefix else phrase.tokens
        last = phrase.tokens[-1] if phrase.prefix else None
        vals = sorted({term_prefix_py(t) for t in full})
        pred = F.col("term_pfx").isin(vals) if vals else None
        if last is not None:
            if len(last) >= 2:
                lp = F.col("term_pfx") == term_prefix_py(last)
            else:
                lp = F.col("term_pfx").startswith("p" + last)
            pred = lp if pred is None else (pred | lp)
        if pred is not None:
            p = p.filter(pred)
    elif (
        getattr(fts, "term_partitions", 0)
        and phrase.tokens
        and not phrase.prefix
    ):
        from dogsheep_beta_spark.operators.fts_index import term_bucket_py

        buckets = sorted(
            {term_bucket_py(t, fts.term_partitions) for t in phrase.tokens}
        )
        p = p.filter(F.col("term_pfx").isin(buckets))
    if phrase.fields is None:
        return p
    if not phrase.fields:  # nested filters intersected to nothing
        return p.limit(0)
    if len(phrase.fields) == 1:
        return p.filter(F.col("field") == phrase.fields[0])
    return p.filter(F.col("field").isin(list(phrase.fields)))


def phrase_hits(fts, phrase: Phrase, phrase_id: int) -> DataFrame:
    """(phrase_id, type, key, tf) — docs containing the phrase, with the
    flattened (cross-field) term frequency for BM25.  A column-filtered
    phrase only counts tf in its filtered fields (FTS5's phrase
    iterators never visit excluded columns)."""
    p = _scoped_postings(fts, phrase)
    toks = phrase.tokens
    if not toks:
        return (
            p.select("type", "key")
            .limit(0)
            .withColumn("phrase_id", F.lit(phrase_id))
            .withColumn("tf", F.lit(0).cast("long"))
            .select("phrase_id", "type", "key", "tf")
        )

    def term_pred(t: str, is_last: bool):
        if is_last and phrase.prefix:
            return F.col("term").startswith(t)
        return F.col("term") == t

    if len(toks) == 1:
        hits = p.filter(term_pred(toks[0], True)).select(
            "type", "key", "field", F.col("tf").alias("ptf"), "positions"
        )
        if phrase.initial:
            hits = hits.filter(F.array_contains("positions", 0)).withColumn(
                "ptf", F.lit(1)
            )
        out = hits.groupBy("type", "key").agg(F.sum("ptf").alias("tf"))
    else:
        cur = _phrase_end_positions(p, phrase)
        out = (
            cur.withColumn("ptf", F.size("pos"))
            .groupBy("type", "key")
            .agg(F.sum("ptf").alias("tf"))
        )
    return out.select(
        F.lit(phrase_id).alias("phrase_id"), "type", "key", F.col("tf").cast("long")
    )


def _phrase_end_positions(p: DataFrame, phrase: Phrase) -> DataFrame:
    """(type, key, field, pos) with ``pos`` = array of END-token
    positions of every instance of a multi-token phrase: positional
    adjacency within one field — carry the set of end positions of the
    phrase-so-far, shift by one, intersect."""
    toks = phrase.tokens

    def term_pred(t: str, is_last: bool):
        if is_last and phrase.prefix:
            return F.col("term").startswith(t)
        return F.col("term") == t

    cur = p.filter(term_pred(toks[0], False)).select(
        "type", "key", "field", F.col("positions").alias("pos")
    )
    if phrase.initial:
        cur = cur.withColumn("pos", F.filter("pos", lambda x: x == 0)).filter(
            F.size("pos") > 0
        )
    for i, t in enumerate(toks[1:], start=1):
        is_last = i == len(toks) - 1
        nxt = p.filter(term_pred(t, is_last)).select(
            "type", "key", "field", F.col("positions").alias("pos2")
        )
        cur = (
            cur.join(nxt, ["type", "key", "field"])
            .withColumn(
                "pos",
                F.array_intersect(
                    F.transform("pos", lambda x: x + 1), F.col("pos2")
                ),
            )
            .filter(F.size("pos") > 0)
            .drop("pos2")
        )
    return cur


def phrase_instances(fts, phrase: Phrase) -> DataFrame:
    """(type, key, field, first, last) — one row per phrase instance,
    carrying the first/last token positions (NEAR needs the span)."""
    p = _scoped_postings(fts, phrase)
    toks = phrase.tokens
    if not toks:
        return (
            p.select("type", "key", "field")
            .limit(0)
            .withColumn("first", F.lit(0))
            .withColumn("last", F.lit(0))
        )

    if len(toks) == 1:
        pred = (
            F.col("term").startswith(toks[0])
            if phrase.prefix
            else F.col("term") == toks[0]
        )
        inst = p.filter(pred).select(
            "type", "key", "field", F.explode("positions").alias("last")
        )
        if phrase.initial:
            inst = inst.filter(F.col("last") == 0)
        return inst.withColumn("first", F.col("last"))
    ends = _phrase_end_positions(p, phrase).select(
        "type", "key", "field", F.explode("pos").alias("last")
    )
    return ends.withColumn("first", F.col("last") - (len(toks) - 1))


def near_docset(fts, near: Near) -> DataFrame:
    """(type, key) docs satisfying the NEAR group: exists one instance
    per phrase (instances may coincide for repeated phrases), all in
    the SAME field, such that EVERY PAIR of chosen instances has at
    most ``near.n`` separating tokens — FTS5's actual rule, which over
    a chosen assignment reduces to max(first) - min(last) - 1 <= n
    (the widest pair is (latest-starting, earliest-ending)).

    The r11 grammar differential replaced the previous
    outermost-span rule (maxLast - minFirst <= n + T - 1): identical
    for two phrases, but for >= 3 it admitted clusters FTS5 rejects —
    NEAR(a b c, 0) on "a b c" must NOT match, because the (a, c) pair
    has one separating token.

    Plan shape: iterative equi-join on (type, key, field) carrying the
    running (maxFirst, minLast); the pairwise bound is applied after
    every join (maxFirst - minLast is monotone nondecreasing in phrase
    count, so early pruning never drops a viable cluster).  Candidate
    volume per doc-field is the product of per-phrase instance counts
    — bounded in practice by tf."""
    insts = [phrase_instances(fts, p) for p in near.phrases]
    acc = insts[0].select(
        "type",
        "key",
        "field",
        F.col("first").alias("maxf"),
        F.col("last").alias("minl"),
    )
    for nxt in insts[1:]:
        acc = (
            acc.join(nxt, ["type", "key", "field"])
            .select(
                "type",
                "key",
                "field",
                F.greatest("maxf", "first").alias("maxf"),
                F.least("minl", "last").alias("minl"),
            )
            .filter(F.col("maxf") - F.col("minl") - 1 <= near.n)
        )
    return acc.select("type", "key").distinct()


def _docset(node, fts, hit_cache: dict) -> DataFrame:
    """(type, key) docs matching the boolean tree."""
    if isinstance(node, Phrase):
        return hit_cache[id(node)].select("type", "key")
    if isinstance(node, Near):
        return near_docset(fts, node)
    if isinstance(node, And):
        if not node.items:
            return fts.postings.select("type", "key").limit(0)
        sets = [_docset(it, fts, hit_cache) for it in node.items]
        return reduce(lambda a, b: a.join(b, ["type", "key"], "left_semi"), sets)
    if isinstance(node, Or):
        sets = [_docset(it, fts, hit_cache) for it in node.items]
        return reduce(lambda a, b: a.unionByName(b), sets).distinct()
    if isinstance(node, Not):
        left = _docset(node.left, fts, hit_cache)
        right = _docset(node.right, fts, hit_cache)
        return left.join(right, ["type", "key"], "left_anti")
    raise TypeError(f"unknown node {node!r}")


def _phrase_cache_key(ph: Phrase) -> tuple:
    """Content identity of a phrase — the LRU key in FtsIndex.hit_caches
    (two requests with the same phrase text share one persisted plan)."""
    return (tuple(ph.tokens), ph.prefix, ph.initial, ph.fields)


def compile_match(ast, fts) -> tuple[DataFrame, DataFrame]:
    """AST → (docset (type,key), phrase_hits (phrase_id,type,key,tf))."""
    phrases = collect_phrases(ast)
    # Persisted per (phrase CONTENT, position): a repeated query string
    # reuses its cached plans wholesale, and the cache is a bounded LRU
    # on the index (FtsIndex.cached_phrase_hits) — a long-running
    # server no longer accumulates one persisted DataFrame per request
    # forever (round-6 serve-mode fix).  The positional phrase_id
    # literal stays INSIDE the persisted plan on purpose: exposed as a
    # visible projection over the cache boundary, Catalyst folds the
    # downstream df⋈hits equi-join on phrase_id into a cross join and
    # the size estimate explodes past the broadcast threshold,
    # regressing the search join to sort-merge (plan-asserted in
    # tests/test_plans.py::test_search_path_has_no_sort_merge_join).
    hit_cache = {
        id(ph): fts.cached_phrase_hits(
            _phrase_cache_key(ph) + (i,),
            lambda p=ph, j=i: phrase_hits(fts, p, j),
        )
        for i, ph in enumerate(phrases)
    }
    docset = _docset(ast, fts, hit_cache)
    if phrases:
        all_hits = reduce(
            lambda a, b: a.unionByName(b), [hit_cache[id(p)] for p in phrases]
        )
    else:
        all_hits = phrase_hits(fts, Phrase([]), 0)
    return docset, all_hits
