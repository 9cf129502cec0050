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

Grammar (FTS5 subset; operators must be uppercase, like FTS5):
    query   := or_expr
    or_expr := and_expr ('OR' and_expr)*
    and_expr:= not_expr (('AND')? not_expr)*
    not_expr:= primary ('NOT' primary)*
    primary := '(' query ')' | '"' ... '"' ['*'] | ['^'] word ['*']

Any character outside barewords/operators/quotes raises ParseError →
the caller escapes and recompiles (same two-phase flow as the
reference).
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

_WORD = re.compile(r"[A-Za-z0-9_-￿]+")
_WS = re.compile(r"\s+")


def _lex(q: str) -> list[tuple[str, str]]:
    out = []
    i, n = 0, len(q)
    while i < n:
        m = _WS.match(q, i)
        if m:
            i = m.end()
            continue
        ch = q[i]
        if ch == "(":
            out.append(("LP", "("))
            i += 1
        elif ch == ")":
            out.append(("RP", ")"))
            i += 1
        elif ch == "^":
            out.append(("CARET", "^"))
            i += 1
        elif ch == "*":
            out.append(("STAR", "*"))
            i += 1
        elif ch == '"':
            j = q.find('"', i + 1)
            if j < 0:
                raise ParseError("unterminated phrase")
            out.append(("QUOTED", q[i + 1 : j]))
            i = j + 1
        else:
            m = _WORD.match(q, i)
            if not m:
                raise ParseError(f"unexpected character {ch!r} at {i}")
            word = m.group(0)
            if word in ("AND", "OR", "NOT"):
                out.append((word, word))
            else:
                out.append(("WORD", word))
            i = m.end()
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], analyze):
        self.toks = tokens
        self.pos = 0
        self.analyze = analyze  # str -> list[str] (tokenize + optional stem)

    def peek(self):
        return self.toks[self.pos][0] if self.pos < len(self.toks) else None

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
        while self.peek() in ("AND", "LP", "WORD", "QUOTED", "CARET"):
            if self.peek() == "AND":
                self.take()
            items.append(self.not_expr())
        return items[0] if len(items) == 1 else And(items)

    def not_expr(self):
        node = self.primary()
        while self.peek() == "NOT":
            self.take()
            node = Not(node, self.primary())
        return node

    def primary(self):
        kind = self.peek()
        if kind == "LP":
            self.take()
            node = self.or_expr()
            if self.peek() != "RP":
                raise ParseError("expected )")
            self.take()
            return node
        if kind == "CARET":
            self.take()
            if self.peek() not in ("WORD", "QUOTED"):
                raise ParseError("expected term after ^")
            node = self.primary()
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


def parse_match(q: str, analyze) -> object:
    """Parse a MATCH query; raise ParseError on FTS5-invalid syntax."""
    toks = _lex(q)
    if not toks:
        raise ParseError("empty query")
    return _Parser(toks, analyze).parse()


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
    a matching row, regardless of its position in the boolean tree."""
    if isinstance(node, Phrase):
        return [node]
    if isinstance(node, (And, Or)):
        return [p for it in node.items for p in collect_phrases(it)]
    if isinstance(node, Not):
        return collect_phrases(node.left) + collect_phrases(node.right)
    return []


def phrase_hits(fts, phrase: Phrase, phrase_id: int) -> DataFrame:
    """(phrase_id, type, key, tf) — docs containing the phrase, with the
    flattened (cross-field) term frequency for BM25."""
    p = fts.postings
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
        # positional adjacency within one field: carry the set of end
        # positions of the phrase-so-far, shift by one, intersect.
        cur = p.filter(term_pred(toks[0], False)).select(
            "type", "key", "field", F.col("positions").alias("pos")
        )
        if phrase.initial:
            cur = cur.withColumn(
                "pos", F.filter("pos", lambda x: x == 0)
            ).filter(F.size("pos") > 0)
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
        out = (
            cur.withColumn("ptf", F.size("pos"))
            .groupBy("type", "key")
            .agg(F.sum("ptf").alias("tf"))
        )
    return out.select(
        F.lit(phrase_id).alias("phrase_id"), "type", "key", F.col("tf").cast("long")
    )


def _docset(node, fts, hit_cache: dict) -> DataFrame:
    """(type, key) docs matching the boolean tree."""
    if isinstance(node, Phrase):
        return hit_cache[id(node)].select("type", "key")
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


def compile_match(ast, fts) -> tuple[DataFrame, DataFrame]:
    """AST → (docset (type,key), phrase_hits (phrase_id,type,key,tf))."""
    phrases = collect_phrases(ast)
    hit_cache = {
        id(ph): phrase_hits(fts, ph, i).persist() for i, ph in enumerate(phrases)
    }
    docset = _docset(ast, fts, hit_cache)
    if phrases:
        all_hits = reduce(
            lambda a, b: a.unionByName(b), [hit_cache[id(p)] for p in phrases]
        )
    else:
        all_hits = phrase_hits(fts, Phrase([]), 0)
    return docset, all_hits
