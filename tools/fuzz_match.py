"""Seeded MATCH-grammar differential vs real SQLite FTS5 → committed
artifact (VERDICT r11 #7).

Re-runs the tier-1 grammar differential from
``tests/test_properties.py`` (the generator, brute-force AST evaluator,
and FTS5 twin are imported from there — ONE definition, no drift) at a
fixed seed over several random corpora, tallies per-shape-family counts,
and writes ``FUZZ_r{N}.json``.  A MATCH-planner edit that breaks parity
re-proves itself mechanically: re-run, diff the artifact — any
divergence is listed verbatim in the output.

The two standing adjudicated divergences are EXCLUDED by construction,
exactly as in the pytest tier (both pinned by dedicated tests):
- negated all-column colspec inside NOT (FTS5 3.40 iterator quirk —
  ``test_match_all_column_excluding_colspec_divergence``);
- the rowid-0 quirk family (same suite).

Usage: python tools/fuzz_match.py [--out FUZZ_rN.json] [--n 3000]
"""

from __future__ import annotations

import json
import os
import random
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"),
)

SEED = 20260816


def _families(q: str) -> list[str]:
    """Shape families a query exercises (one query may count in many)."""
    fams = []
    if "NEAR(" in q:
        fams.append("near")
    if re.search(r'"[^"]*"\*', q):
        fams.append("phrase_prefix")
    elif '"' in q:
        fams.append("phrase")
    if re.search(r"\w\*", q):
        fams.append("prefix")
    if "^" in q:
        fams.append("initial_anchor")
    if re.search(r"-?\{[^}]*\}:", q):
        fams.append("colspec_braced")
    if re.search(r"(?<![\w}])-?(?:title|search_1):", q):
        fams.append("colspec_plain")
    if re.search(r"-(?:\{|title:|search_1:)", q):
        fams.append("colspec_negated")
    if " NOT " in q:
        fams.append("not")
    if " OR " in q:
        fams.append("or")
    if " AND " in q:
        fams.append("and_explicit")
    if re.search(r"(?<!NEAR)\(", q):
        fams.append("parens")
    if re.search(r"café|naïve|übermut|señor", q):
        fams.append("diacritics")
    if re.search(r'"(\s*|-)"', q):
        fams.append("tokenless_phrase")
    if not fams:
        fams.append("bare_terms")
    return fams


def main() -> None:
    out_path = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--out=")),
        "FUZZ.json",
    )
    n_queries = int(
        next(
            (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--n=")),
            "3000",
        )
    )

    import test_properties as tp  # the single grammar/evaluator definition
    from dogsheep_beta_spark.functions.tokenizer import analyze_py
    from dogsheep_beta_spark.plans.match import ParseError, parse_match

    def analyze(s):
        return analyze_py(s, "unicode61", False)

    rng = random.Random(SEED)
    n_corpora = 5
    per = n_queries // n_corpora
    checked = rejects = 0
    fam_counts: dict[str, int] = {}
    divergences: list[dict] = []

    for ci in range(n_corpora):
        rows, con = tp._mf_corpus_and_fts5(rng)
        docs = {
            k: {"title": analyze(t or ""), "search_1": analyze(s or "")}
            for k, t, s in rows
        }
        for _ in range(per):
            q = tp._mf_query(rng)
            want = tp._mf_fts5_keys(con, q)
            try:
                ast = parse_match(q, analyze, columns=tp._MF_COLS)
            except ParseError:
                ast = None
            for f in _families(q):
                fam_counts[f] = fam_counts.get(f, 0) + 1
            if ast is None or want is None:
                if (ast is None) != (want is None):
                    divergences.append(
                        {
                            "corpus": ci,
                            "query": q,
                            "kind": "reject",
                            "spark_parsed": ast is not None,
                            "fts5_parsed": want is not None,
                        }
                    )
                else:
                    rejects += 1
                continue
            got = tp._mf_eval(ast, docs)
            if got != want:
                divergences.append(
                    {
                        "corpus": ci,
                        "query": q,
                        "kind": "docset",
                        "ours": sorted(got),
                        "fts5": sorted(want),
                    }
                )
            else:
                checked += 1
        con.close()

    record = {
        "seed": SEED,
        "sqlite_fts5": __import__("sqlite3").sqlite_version,
        "n_corpora": n_corpora,
        "n_queries": n_corpora * per,
        "n_docset_agreed": checked,
        "n_reject_agreed": rejects,
        "n_divergences": len(divergences),
        "divergences": divergences[:50],
        "families": dict(sorted(fam_counts.items())),
        "pinned_exclusions": [
            "negated all-column colspec inside NOT "
            "(test_match_all_column_excluding_colspec_divergence)",
            "FTS5 rowid-0 quirk family (same suite)",
        ],
    }
    with open(out_path, "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps({k: v for k, v in record.items() if k != "divergences"}))
    sys.exit(1 if divergences else 0)


if __name__ == "__main__":
    main()
