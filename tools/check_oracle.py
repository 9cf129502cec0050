"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()[name]`` on Spark and ``oracle_sql()[name]`` on
DuckDB over the same sf dir, canonicalizes both results (columns sorted by
name, rows sorted by all columns), and diffs values.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def spark_session():
    from pyspark.sql import SparkSession

    # SPARK_GRAFT_MASTER lets the r11 cluster gate run this same tool
    # under a REAL executor boundary (local-cluster[2,4,4096]) — one
    # JVM per executor, closures/broadcasts actually serialized —
    # without touching the default local[8] used while iterating.
    master = os.environ.get("SPARK_GRAFT_MASTER", "local[8]")
    builder = (
        SparkSession.builder.master(master)
        .appName("check_oracle")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    if master.startswith("local-cluster"):
        builder = builder.config("spark.executor.memory", "4g")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if not master.startswith("local["):
        # real executor boundary: ship the package like --py-files would
        from dogsheep_beta_spark.deploy import ship_package

        ship_package(spark)
    return spark


def _is_null(v) -> bool:
    """True for the NULL objects the two engines hand back (None, NaT,
    NaN incl. np.float32, pd.NA) — checked BEFORE stringification so a
    literal string 'nan'/'None'/'NaT' in real data stays a real value
    (a str() check here used to mask genuine mismatches as NULL-equal).
    pd.isna covers every scalar null family; arrays/lists are values."""
    try:
        r = pd.isna(v)
    except (TypeError, ValueError):
        return False
    return bool(r) if not hasattr(r, "__len__") else False


def _canon_str(v) -> str:
    """One value's canonical text.  A trailing ' 00:00:00' is stripped
    so a DATE on one engine equals a midnight DATETIME on the other —
    duckdb.fetchdf() widens DATE columns to datetime64, while Spark
    hands back datetime.date objects (the old column-level astype(str)
    rendered all-midnight datetime64 columns date-only; per-value str()
    must reproduce that)."""
    s = str(v)
    return s[:-9] if s.endswith(" 00:00:00") else s


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # normalize date/datetime-ish to ISO strings for comparison,
        # keeping NULLs as None (never the strings 'None'/'NaT')
        if df[c].dtype == "object" or "datetime" in str(df[c].dtype) or str(
            df[c].dtype
        ) == "date":
            df[c] = pd.Series(
                [None if _is_null(v) else _canon_str(v) for v in df[c]],
                index=df.index,
                dtype="object",
            )
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last").reset_index(
            drop=True
        )
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return math.isclose(af, bf, rel_tol=1e-9, abs_tol=1e-9)
    return str(a) == str(b)


def canon_csv(df: pd.DataFrame) -> str:
    """Byte-level canonical CSV — a local re-implementation of the
    driver's hash input.  Columns sorted by name, rows sorted by all
    columns, every cell rendered to text.  Catches dtype-representation
    drift (e.g. DuckDB HUGEINT→float64 '8570.0' vs Spark BIGINT '8570')
    that the tolerant value diff forgives."""
    df = canon(df).copy()
    for c in df.columns:
        df[c] = df[c].map(_cell_repr)
    return df.to_csv(index=False)


def _cell_repr(v) -> str:
    if v is None:
        return ""
    if isinstance(v, float):
        if math.isnan(v):
            return ""
        # stable float text: round-trip repr, 12 significant digits
        return format(v, ".12g")
    return str(v)


def dtype_parity_problems(
    spark_pd: pd.DataFrame, duck_pd: pd.DataFrame
) -> list[str]:
    """Fail when one engine hands back an integer column and the other a
    float column for the same name.  The driver's hash stringifies cells
    raw, so DuckDB HUGEINT→float64 renders '1435.0' against Spark's
    '1435' and every hash differs — while this gate's `.12g` float text
    used to collapse the two (the round-6/7 `sample_token_budget`
    misread: the driver was red twice and the local gate green, so the
    red was adjudicated as a flake when it was an oracle dtype bug).
    The local gate must be at least as strict as the driver's."""
    problems = []
    for c in sorted(set(spark_pd.columns) & set(duck_pd.columns)):
        ka = getattr(spark_pd[c].dtype, "kind", "O")
        kb = getattr(duck_pd[c].dtype, "kind", "O")
        ints, flts = {"i", "u"}, {"f"}
        if (ka in ints and kb in flts) or (ka in flts and kb in ints):
            problems.append(
                f"column {c}: int-vs-float dtype divergence "
                f"(spark={spark_pd[c].dtype} duck={duck_pd[c].dtype}) — "
                f"the driver's raw-str hash WILL reject this even when "
                f"values are numerically equal; CAST the oracle (DuckDB "
                f"HUGEINT sums need CAST(... AS BIGINT)) or the Spark side"
            )
    return problems


def compare_strict(
    name: str, spark_pd: pd.DataFrame, duck_pd: pd.DataFrame
) -> list[str]:
    import hashlib

    dtp = dtype_parity_problems(spark_pd, duck_pd)
    if dtp:
        return dtp
    a, b = canon_csv(spark_pd), canon_csv(duck_pd)
    if a == b:
        return []
    ha = hashlib.sha256(a.encode()).hexdigest()[:12]
    hb = hashlib.sha256(b.encode()).hexdigest()[:12]
    la, lb = a.splitlines(), b.splitlines()
    first = next(
        (i for i, (x, y) in enumerate(zip(la, lb)) if x != y),
        min(len(la), len(lb)),
    )
    sa = la[first] if first < len(la) else "<missing>"
    sb = lb[first] if first < len(lb) else "<missing>"
    return [
        f"strict CSV hash differs: spark={ha} duck={hb}; "
        f"first diff line {first}: spark={sa!r} duck={sb!r}"
    ]


def compare(name: str, spark_pd: pd.DataFrame, duck_pd: pd.DataFrame) -> list[str]:
    problems = []
    a, b = canon(spark_pd), canon(duck_pd)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: spark={list(a.columns)} duck={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} duck={len(b)}")
        return problems
    for c in a.columns:
        av, bv = list(a[c]), list(b[c])
        bad = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(av, bv))
            if not values_equal(
                None if _is_null(x) else x,
                None if _is_null(y) else y,
            )
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"column {c}: {len(bad)} mismatches; first at row {i}: "
                f"spark={x!r} duck={y!r}"
            )
    return problems


def register_duck_views(con, sf_dir: str) -> None:
    """One DuckDB view per testdata table — shared by this gate AND
    bench.py, so the correctness gate and the bench can never silently
    run against different catalogs (the table list lives with the
    engine's own registry)."""
    from dogsheep_beta_spark.sources.registry import TESTDATA_TABLES

    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    strict = "--strict" in sys.argv[1:]
    # --json=PATH: write the per-query machine-readable record (VERDICT
    # r6 #9 — the committed full-gate artifact, so the driver's 50-key
    # window is no longer the only machine-readable correctness record)
    json_path = next(
        (
            a.split("=", 1)[1]
            for a in sys.argv[1:]
            if a.startswith("--json=")
        ),
        None,
    )
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entrymod

    spark = spark_session()
    con = duckdb.connect()
    register_duck_views(con, sf_dir)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # Python oracles (VERDICT r11 #2): queries whose defining transform
    # has no SQL twin (zlib) get a driver-side recompute over DuckDB's
    # own parquet rows, compared through the SAME canon + strict-CSV
    # machinery as the SQL oracles — no more SKIP_NO_ORACLE rows.
    py_oracles = getattr(entrymod, "oracle_py", dict)() or {}
    failures = 0
    record: dict = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            record[name] = {"status": "FAIL", "err": f"spark: {e}"}
            failures += 1
            continue
        t_spark = time.time() - t0
        oracle_kind = "sql" if name in oracles else (
            "python" if name in py_oracles else None
        )
        if oracle_kind is None:
            print(f"SKIP {name}: no oracle (rows={len(sdf)}, {t_spark:.1f}s)")
            record[name] = {
                "status": "SKIP_NO_ORACLE",
                "spark_rows": len(sdf),
                "spark_sec": round(t_spark, 2),
            }
            continue
        t0 = time.time()
        try:
            if oracle_kind == "sql":
                ddf = con.execute(oracles[name]).fetchdf()
            else:
                ddf = py_oracles[name](con, sf_dir)
        except Exception as e:
            print(f"FAIL {name}: {oracle_kind}-oracle error: {e}")
            record[name] = {"status": "FAIL", "err": f"{oracle_kind}-oracle: {e}"}
            failures += 1
            continue
        t_duck = time.time() - t0
        problems = compare(name, sdf, ddf)
        if strict and not problems:
            problems = compare_strict(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL {name} (rows spark={len(sdf)} duck={len(ddf)}):")
            for p in problems:
                print(f"    {p}")
            record[name] = {
                "status": "FAIL",
                "spark_rows": len(sdf),
                "oracle_rows": len(ddf),
                "problems": problems,
            }
        else:
            print(
                f"OK   {name}: {len(sdf)} rows  spark={t_spark:.1f}s duck={t_duck:.2f}s"
            )
            record[name] = {
                "status": "OK_STRICT" if strict else "OK",
                "oracle": oracle_kind,
                "spark_rows": len(sdf),
                "oracle_rows": len(ddf),
                "spark_sec": round(t_spark, 2),
                "duck_sec": round(t_duck, 2),
            }
    if json_path:
        import json

        with open(json_path, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "strict": strict,
                    "n_queries": len(record),
                    "n_failures": failures,
                    "queries": record,
                },
                fh,
                indent=1,
            )
        print(f"# wrote {json_path}")
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
