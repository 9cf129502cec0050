"""Time a subset of declared queries (and their DuckDB oracles) at one
sf_dir — the targeted inner loop for performance work, same warm-run
protocol as bench.py.

    python tools/timeq.py hydrate_display search_hybrid_rerank [--iters 3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    iters = 3
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a.startswith("--iters"):
            if "=" in a:
                iters = int(a.split("=")[1])
            else:
                iters = int(args[i + 1])
                i += 1
        else:
            names.append(a)
        i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dbs_timeq")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()

    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    out = {}
    for name in names:
        runs = []
        for _ in range(iters):
            t0 = time.time()
            qs[name](spark, sf_dir).toPandas()
            runs.append(round(time.time() - t0, 3))
        drow = None
        if name in oracles:
            druns = []
            for _ in range(iters):
                t0 = time.time()
                con.execute(oracles[name]).fetchall()
                druns.append(round(time.time() - t0, 3))
            drow = min(druns)
        out[name] = {"spark": min(runs), "spark_runs": runs, "duck": drow}
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
