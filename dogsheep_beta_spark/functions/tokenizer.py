"""Tokenization for the full-text index (SURVEY.md §2 H7, A9).

The reference delegates to SQLite FTS5 tokenizers (utils.py:90,
cli.py:22-26): default ``porter`` (unicode61 split + Porter stemming),
or ``none`` → unicode61 only.  Tokenizer behavior is pinned by
/root/reference/tests/test_cli.py:104-122 ("run" matches "running" with
porter, not without).

Spark mapping:
- the *split* is a JVM-side expression (``lower`` + ``split`` on a
  character-class regex) — stays inside whole-stage codegen;
- Porter stemming is the one genuinely Python step: an Arrow-batched
  pandas UDF over the token array (never row-at-a-time).

Two split modes:
- ``unicode61``: split on anything that is not a Unicode letter/digit
  (Java regex ``[^\\p{L}\\p{N}]+``), after diacritic REMOVAL — FTS5's
  unicode61 defaults to ``remove_diacritics=1``
  (/root/reference/dogsheep_beta/utils.py:90 delegates tokenizer
  choice to FTS5), so ``café`` and ``cafe`` index to the same term.
  Folding is a pure JVM ``translate``: precomposed Latin letters map
  1:1 to their base letter and combining marks (U+0300–U+036F) are
  deleted, so NFC and NFD input land on the same token.
- ``portable``: split on ``[^a-z0-9]+`` after lowercasing — the
  oracle-checkable definition shared with DuckDB (SURVEY.md §5.3).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

PORTABLE_SPLIT = "[^a-z0-9]+"
UNICODE61_SPLIT = r"[^\p{L}\p{N}]+"


def _fold_tables() -> tuple[str, str]:
    """(src, dst) for ``translate``: every Latin-range precomposed
    letter whose NFD form is one ASCII base + combining marks maps to
    the base; the combining-mark block itself is appended to src with
    no dst counterpart, which ``translate`` treats as deletion.  Built
    from unicodedata at import — deterministic, mirrors FTS5
    unicode61 ``remove_diacritics=1`` over the Latin scripts."""
    src, dst = [], []
    for cp in range(0xC0, 0x250):  # Latin-1 Supplement .. Latin Ext-B
        ch = chr(cp)
        base = "".join(
            c for c in unicodedata.normalize("NFD", ch)
            if not unicodedata.combining(c)
        )
        if base != ch and len(base) == 1 and ord(base) < 0x80:
            src.append(ch)
            dst.append(base)
    marks = "".join(chr(cp) for cp in range(0x300, 0x370))
    return "".join(src) + marks, "".join(dst)


_FOLD_SRC, _FOLD_DST = _fold_tables()
_FOLD_MAP = str.maketrans(
    {s: (_FOLD_DST[i] if i < len(_FOLD_DST) else None)
     for i, s in enumerate(_FOLD_SRC)}
)

# [\W_]+ ≡ anything that is not a Unicode letter/digit (underscore is a
# separator in FTS5 unicode61, unlike in \w).
_PY_SPLIT = {"portable": re.compile("[^a-z0-9]+"), "unicode61": re.compile(r"[\W_]+", re.UNICODE)}


# ---------------------------------------------------------------------------
# FTS5 tokenizer-argument passthrough (round 6).  The reference forwards
# the --tokenize string verbatim into FTS5 (reference cli.py:22-26 →
# utils.py:90 enable_fts(tokenize=...)), so specs like
# ``unicode61 tokenchars '#'`` are part of its surface.  Here ``mode``
# strings may carry the same argument syntax:
#
#     "portable"                          (plain base)
#     "unicode61 tokenchars '#'"          (promote # to a token char)
#     "unicode61 separators 'X'"          (demote X to a separator)
#     "unicode61 remove_diacritics '0'"   (disable folding)
#
# Semantics (FTS5 unicode61 docs): a codepoint is a token character iff
# (default-token-char OR in tokenchars) AND NOT in separators —
# separators wins when a char appears in both.  The extended mode string
# travels everywhere the plain mode did (FtsIndex.mode, meta.json, the
# incremental maintainer) with no signature changes.
# ---------------------------------------------------------------------------

from functools import lru_cache as _lru_cache
import shlex as _shlex

_MODE_OPTS = {"tokenchars", "separators", "remove_diacritics"}


@_lru_cache(maxsize=128)
def _parse_mode(mode: str) -> tuple[str, str, str, bool]:
    """mode spec → (base, tokenchars, separators, fold_diacritics)."""
    parts = _shlex.split(mode)
    if not parts:
        raise ValueError("empty tokenizer mode")
    base = parts[0]
    if base not in ("portable", "unicode61"):
        raise ValueError(f"unknown tokenizer base {base!r} in {mode!r}")
    args = parts[1:]
    if len(args) % 2:
        raise ValueError(f"dangling tokenizer option in {mode!r}")
    opts = dict(zip(args[0::2], args[1::2]))
    unknown = set(opts) - _MODE_OPTS
    if unknown:
        raise ValueError(f"unknown tokenizer option(s) {sorted(unknown)} in {mode!r}")
    fold = base == "unicode61" and opts.get("remove_diacritics", "1") != "0"
    return base, opts.get("tokenchars", ""), opts.get("separators", ""), fold


def mode_tokenchars(mode: str) -> str:
    """The spec's promoted token characters (for the MATCH lexer's
    bareword charset — FTS5 barewords include tokenchars)."""
    return _parse_mode(mode)[1]


def _class_escape(chars: str) -> str:
    """Escape for inclusion inside a regex character class (valid in
    both Java and Python regex dialects)."""
    return "".join(
        "\\" + c if c in "\\^]-[&" else c for c in dict.fromkeys(chars)
    )


@_lru_cache(maxsize=128)
def _split_pattern(mode: str) -> str:
    """Separator-run regex for the spec (JVM dialect — the index side).

    Built as an alternation: explicit separators first (they win over
    tokenchars), then the default separator class minus tokenchars.

    RAW-CODEPOINT by design: FTS5 classifies token/separator on the
    original codepoints (``separators 'a'`` splits on 'a' but not 'A';
    ``separators 'e'`` does NOT split 'café') and case-folds + removes
    diacritics from the token TEXT afterwards.  The extended path
    therefore splits the original text and folds/lowercases each token
    after.  Default token classes cover both cases and include
    COMBINING MARKS (\\p{M}) so NFD input keeps its marks attached to
    the token (they are then deleted by the fold), matching the plain
    unicode61 path and FTS5.

    The Python query-side twin is ``_py_token_char`` (a character-
    category check, NOT a regex: ``\\w`` misses every mark outside
    U+0300–U+036F, which silently split query tokens the JVM index had
    kept whole — Hebrew niqqud, Indic matras)."""
    base, tc, sp, _fold = _parse_mode(mode)
    tc_cls = _class_escape(tc)
    branches = []
    if sp:
        branches.append(f"[{_class_escape(sp)}]")
    if base == "portable":
        branches.append(f"[^a-zA-Z0-9{tc_cls}]")
    else:
        branches.append(f"[^\\p{{L}}\\p{{M}}\\p{{N}}{tc_cls}]")
    if len(branches) == 1:
        return branches[0] + "+"
    return "(?:" + "|".join(branches) + ")+"


def _py_token_char(ch: str, base: str, tc: str, sp: str) -> bool:
    """Is ``ch`` a token character under the extended spec?  Mirrors
    the JVM class exactly: separators win over tokenchars; default
    token chars are a-zA-Z0-9 (portable) or Unicode categories
    L*/M*/N* (unicode61 — the same set as Java's \\p{L}\\p{M}\\p{N})."""
    if ch in sp:
        return False
    if ch in tc:
        return True
    if base == "portable":
        return ("a" <= ch <= "z") or ("A" <= ch <= "Z") or ("0" <= ch <= "9")
    return unicodedata.category(ch)[0] in ("L", "M", "N")


def parse_fts5_tokenize(
    spec: str, default_base: str = "portable"
) -> tuple[str, bool]:
    """Reference-style ``--tokenize`` string → (mode, stem).

    The reference forwards this string verbatim into FTS5
    (reference cli.py:22-26); accepted shapes:

        porter                               → (default_base, True)
        none                                 → (default_base, False)
        porter unicode61 tokenchars '#'      → ("unicode61 tokenchars '#'", True)
        unicode61 separators 'X'             → ("unicode61 separators 'X'", False)

    ``porter`` is FTS5's wrapper tokenizer (stemming over unicode61 by
    default); ``none`` disables stemming.  Remaining option pairs are
    re-serialized into the canonical extended mode string that
    _parse_mode consumes (validated here so a typo fails at the CLI,
    not mid-job)."""
    parts = _shlex.split(spec or "porter")
    stem = False
    if parts and parts[0] == "porter":
        stem = True
        parts = parts[1:]
    elif parts and parts[0] == "none":
        parts = parts[1:]
    base = default_base
    if parts and parts[0] in ("unicode61", "portable"):
        base = parts[0]
        parts = parts[1:]
    elif parts:
        # bare args after porter/none ("porter tokenchars ...",
        # "none tokenchars ...") — FTS5's default underlying tokenizer
        # is unicode61 in BOTH cases; resolving them differently by
        # stem flag would give the same --tokenize args silently
        # different charsets
        base = "unicode61"
    mode = base
    if parts:
        if len(parts) % 2:
            raise ValueError(f"dangling tokenizer option in {spec!r}")
        for k, v in zip(parts[0::2], parts[1::2]):
            if k not in _MODE_OPTS:
                raise ValueError(f"unknown tokenizer option {k!r} in {spec!r}")
            mode += f" {k} {_shlex.quote(v)}"
    _parse_mode(mode)  # validate eagerly
    return mode, stem


def fold_diacritics_expr(col: Column) -> Column:
    """JVM-side diacritic folding (FTS5 remove_diacritics=1 analog)."""
    return F.translate(col, _FOLD_SRC, _FOLD_DST)


def fold_diacritics_py(text: str) -> str:
    return text.translate(_FOLD_MAP)


def tokenize_expr(col: Column, mode: str = "portable") -> Column:
    """Array of non-empty lowercase tokens — pure JVM expression.
    ``mode`` may carry FTS5 tokenizer arguments (see _parse_mode).
    The extended path splits BEFORE lowercasing (explicit tokenchars/
    separators are case-sensitive raw-codepoint matches, like FTS5)
    and lowercases each token after."""
    if mode == "portable":  # fast path, the dominant spec
        text = F.lower(F.coalesce(col, F.lit("")))
        toks = F.split(text, PORTABLE_SPLIT)
        return F.filter(toks, lambda x: x != "")
    if mode == "unicode61":
        text = fold_diacritics_expr(F.lower(F.coalesce(col, F.lit(""))))
        toks = F.split(text, UNICODE61_SPLIT)
        return F.filter(toks, lambda x: x != "")
    # extended spec: split the RAW text (explicit tokenchars/separators
    # match original codepoints — see _split_pattern), then fold + lower
    # each token, exactly FTS5's classify-then-normalize order
    fold = _parse_mode(mode)[3]
    toks = F.split(F.coalesce(col, F.lit("")), _split_pattern(mode))
    norm = (
        (lambda x: F.lower(fold_diacritics_expr(x))) if fold else F.lower
    )
    return F.filter(F.transform(toks, norm), lambda x: x != "")


def tokenize_py(text: str | None, mode: str = "portable") -> list[str]:
    """Driver-side twin of tokenize_expr (for query-string tokenization)."""
    if not text:
        return []
    if mode in _PY_SPLIT:
        text = text.lower()
        if mode == "unicode61":
            text = fold_diacritics_py(text)
        return [t for t in _PY_SPLIT[mode].split(text) if t]
    base, tc, sp, fold = _parse_mode(mode)
    toks, cur = [], []
    for ch in text:
        if _py_token_char(ch, base, tc, sp):
            cur.append(ch)
        elif cur:
            toks.append("".join(cur))
            cur = []
    if cur:
        toks.append("".join(cur))
    if fold:
        toks = [fold_diacritics_py(t) for t in toks]
    return [t.lower() for t in toks if t]


# ---------------------------------------------------------------------------
# Porter stemmer — standard algorithm (Porter, 1980; public domain spec).
# Deterministic pure Python, applied through an Arrow-batched pandas UDF.
# ---------------------------------------------------------------------------

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """The m in [C](VC)^m[V]."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    """Stem one lowercase token with the classic Porter algorithm.

    FTS5's porter tokenizer runs the algorithm over the UTF-8 BYTE
    string (fts5 porter wraps unicode61 and stems bytes, so e.g.
    ``straße`` → ``straß``: ß is two non-vowel bytes and the final
    ``e`` strips).  Non-ASCII tokens therefore take a byte-faithful
    path: operate on the UTF-8 bytes via a latin-1 char↔byte
    bijection, then decode back (surrogateescape keeps any split
    multi-byte sequence representable)."""
    if not word.isascii():
        as_bytes = word.encode("utf-8").decode("latin-1")
        stemmed = _porter_ascii(as_bytes)
        return stemmed.encode("latin-1").decode("utf-8", errors="surrogateescape")
    return _porter_ascii(word)


def _ends(w: str, suffix: str) -> bool:
    """FTS5's fts5PorterEndsWith contract: the suffix must be PROPER
    (strictly shorter than the word) to match — a bare suffix word
    ('ies', 'sses', 'eed') falls through to the later, shorter rules
    exactly as fts5_tokenize.c does."""
    return len(w) > len(suffix) and w.endswith(suffix)


def _porter_ascii(word: str) -> str:
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if _ends(w, "sses"):
        w = w[:-2]
    elif _ends(w, "ies"):
        w = w[:-2]
    elif w[-1] == "s" and w[-2] != "s":
        w = w[:-1]

    # Step 1b ('eed' failing the proper-suffix test falls THROUGH to
    # the 'ed' rule — fts5: 'eed' -> 'e' via ed-removal)
    if _ends(w, "eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if _ends(w, "ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif _ends(w, "ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # Step 1c
    if _ends(w, "y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    for suf, rep in _STEP2:
        if _ends(w, suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 3
    for suf, rep in _STEP3:
        if _ends(w, suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 4
    for suf in _STEP4:
        if _ends(w, suf):
            stem = w[: -len(suf)]
            if suf == "ion":
                if stem.endswith(("s", "t")) and _measure(stem) > 1:
                    w = stem
            elif _measure(stem) > 1:
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


@F.pandas_udf(T.ArrayType(T.StringType()))
def stem_tokens(batch: pd.Series) -> pd.Series:
    """Arrow-batched Porter stemming over an array<string> column."""
    return batch.map(
        lambda toks: [porter_stem(t) for t in toks] if toks is not None else None
    )


def analyze_expr(col: Column, mode: str = "portable", stem: bool = False) -> Column:
    """Full analyzer: tokenize (JVM) + optional Porter stem (pandas UDF)."""
    toks = tokenize_expr(col, mode)
    return stem_tokens(toks) if stem else toks


def analyze_py(text: str | None, mode: str = "portable", stem: bool = False) -> list[str]:
    """Driver-side analyzer twin, used on query strings."""
    toks = tokenize_py(text, mode)
    return [porter_stem(t) for t in toks] if stem else toks
