"""Targeted optimization profiler (r12): per-query warm wall, Spark
JOB COUNT, and optionally the formatted plan written to plans/r12/.

Job count is the delta of the DAGScheduler's nextJobId around the
timed action — the per-query "how many job floors am I paying" number
that the bench's aggregate wall hides.  Usage:

    python tools/optprof.py dedup_cluster_keep pipeline_clean_corpus \
        [--iters 3] [--plans plans/r12] [--suffix before]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    iters, plans_dir, suffix = 3, None, "before"
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a.startswith("--iters"):
            iters = int(a.split("=")[1]) if "=" in a else int(args[i + 1])
            i += 1 if "=" not in a else 0
        elif a.startswith("--plans"):
            plans_dir = a.split("=")[1] if "=" in a else args[i + 1]
            i += 1 if "=" not in a else 0
        elif a.startswith("--suffix"):
            suffix = a.split("=")[1] if "=" in a else args[i + 1]
            i += 1 if "=" not in a else 0
        else:
            names.append(a)
        i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    # SPARK_GRAFT_MASTER overrides local[N] so targeted profiles can
    # run under the same local-cluster executor boundary as the r12
    # cluster bench/gate (bench.py and check_oracle.py honor it too)
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    spark = (
        SparkSession.builder.master(master)
        .appName("dbs_optprof")
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
    from dogsheep_beta_spark.deploy import ship_package

    ship_package(spark)

    import __spark_entry__ as entry

    qs = entry.queries()
    sc = spark.sparkContext

    def next_job_id() -> int:
        v = sc._jsc.sc().dagScheduler().nextJobId()
        return v if isinstance(v, int) else v.get()

    out: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            print(f"# unknown query {name}", file=sys.stderr)
            continue
        fn = qs[name]
        walls, jobs, builds, plans = [], [], [], []
        for it in range(iters):
            j0 = next_job_id()
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df._jdf.queryExecution().executedPlan()
            t2 = time.time()
            df.toPandas()
            walls.append(time.time() - t0)
            builds.append(t1 - t0)
            plans.append(t2 - t1)
            jobs.append(next_job_id() - j0)
        out[name] = {
            "wall_min": round(min(walls), 3),
            "walls": [round(w, 3) for w in walls],
            "build_df": [round(b, 3) for b in builds],
            "catalyst": [round(p, 3) for p in plans],
            "jobs": jobs,
        }
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            plan = re.sub(r"[\x00-\x08\x0b-\x1f]", "?", plan)
            with open(
                os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
