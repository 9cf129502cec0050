"""Bench-faithful per-query overhead profiler (r12).

Replicates bench.py's session config, build phase and query order
EXACTLY, but around each timed window also records:

- ``jobs``: DAGScheduler nextJobId delta (how many job floors paid)
- ``phases``: Spark's own QueryPlanningTracker phase summary for the
  last execution (parsing/analysis/optimization/planning ms)
- ``walls``: per-iteration wall (same ITERS=2, min is the headline)

Output: ONE json file (arg 1, default /tmp/jobprof.json).

Usage: python tools/jobprof.py [out.json] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out_path = "/tmp/jobprof.json"
    names: list[str] = []
    for a in args:
        if a.endswith(".json"):
            out_path = a
        else:
            names.append(a)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dbs_jobprof")
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

    sc = spark.sparkContext

    def next_job_id() -> int:
        v = sc._jsc.sc().dagScheduler().nextJobId()
        return v if isinstance(v, int) else v.get()

    builds: dict[str, float] = {}
    for label, build in (
        ("index_build", entry._ctx),
        ("index_build_porter", entry._ctx_porter),
        ("ivf_build", entry._ivf_layout),
        ("kmeans_build", entry._kmeans_layout),
        ("bucketed_layout_build", entry._bucketed_tables),
        ("zorder_layout_build", entry._zorder_layout),
        ("manifest_layout_build", entry._manifest_layout),
        ("tokargs_fts_build", entry._ctx_tokargs),
        ("pq_build", entry._pq_layout),
        ("minhash_stream_build", entry._minhash_stream_layout),
        ("importance_ratio_build", entry._importance_ratios),
        ("semantic_stream_build", entry._semantic_stream_layout),
        ("semantic_maint_build", entry._semantic_maint_layout),
        ("kmv_stream_build", entry._kmv_stream_layout),
        ("cms_stream_build", entry._cms_stream_layout),
        ("gram_stream_build", entry._gram_stream_layout),
        ("bpe_merges_build", entry._bpe_merges_ctx),
        ("cascade_build", entry._cascade_ctx),
        ("ann_recall_build", entry._recall_panel),
        ("ann_recall_clustered_build", entry._recall_panel_clustered),
        ("quality_probe_build", entry._quality_probe),
        ("pretrain_build", entry._pretrain_ctx),
        ("lloyd_build", entry._lloyd_layout),
    ):
        t0 = time.time()
        j0 = next_job_id()
        try:
            build(spark, sf_dir)
            builds[label] = {
                "sec": round(time.time() - t0, 3),
                "jobs": next_job_id() - j0,
            }
        except Exception as e:
            builds[label] = {"sec": -1.0, "jobs": -1}
            print(f"# jobprof error in {label}: {e}", file=sys.stderr)

    ITERS = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "2"))
    out: dict[str, dict] = {}
    for name, fn in entry.queries().items():
        if names and name not in names:
            continue
        walls, jobcounts, phases = [], [], []
        try:
            for _ in range(ITERS):
                j0 = next_job_id()
                t0 = time.time()
                df = fn(spark, sf_dir)
                t1 = time.time()
                df.toPandas()
                walls.append(round(time.time() - t0, 3))
                jobcounts.append(next_job_id() - j0)
                try:
                    tr = df._jdf.queryExecution().tracker()
                    ph = {}
                    it = tr.phases().iterator()
                    while it.hasNext():
                        kv = it.next()
                        s = kv._2()
                        ph[kv._1()] = int(
                            s.endTimeMs() - s.startTimeMs()
                        )
                    ph["build_py_ms"] = int((t1 - t0) * 1000)
                    phases.append(ph)
                except Exception:
                    phases.append({})
        except Exception as e:
            print(f"# jobprof error in {name}: {e}", file=sys.stderr)
            out[name] = {"error": str(e)[:200]}
            continue
        out[name] = {
            "wall_min": min(walls),
            "walls": walls,
            "jobs": jobcounts,
            "phases": phases,
        }
    with open(out_path, "w") as fh:
        json.dump({"builds": builds, "queries": out}, fh, indent=1)
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
