"""Streaming lifecycle profiler (r13): per-micro-batch ``durationMs``
split captured via a ``StreamingQueryListener`` while running declared
queries, plus warm wall and Spark job count per iteration.

The listener sees every ``StreamingQueryProgress`` the session emits —
``addBatch`` / ``getBatch`` / ``latestOffset`` / ``queryPlanning`` /
``walCommit`` / ``commitOffsets`` / ``triggerExecution`` — which is the
evidence VERDICT r12 #1 asks for on the foreachBatch lifecycle rows
(the bench's aggregate wall hides where a stream's time goes).

Usage:

    python tools/streamprof.py layout_objectstore_commit \
        streaming_ivf_upsert streaming_entity_link \
        [--iters 2] [--out /tmp/streamprof.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    iters, out_path = 2, "/tmp/streamprof.json"
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a.startswith("--iters"):
            iters = int(a.split("=")[1]) if "=" in a else int(args[i + 1])
            i += 1 if "=" not in a else 0
        elif a.startswith("--out"):
            out_path = a.split("=")[1] if "=" in a else args[i + 1]
            i += 1 if "=" not in a else 0
        else:
            names.append(a)
        i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    from pyspark.sql.streaming.listener import StreamingQueryListener

    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    spark = (
        SparkSession.builder.master(master)
        .appName("dbs_streamprof")
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

    progress_rows: list[dict] = []

    class _Cap(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            progress_rows.append(
                {
                    "name": p.name,
                    "batchId": p.batchId,
                    "numInputRows": p.numInputRows,
                    "durationMs": dict(p.durationMs),
                }
            )

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(_Cap())

    import __spark_entry__ as entry

    qs = entry.queries()
    sc = spark.sparkContext

    def next_job_id() -> int:
        v = sc._jsc.sc().dagScheduler().nextJobId()
        return v if isinstance(v, int) else v.get()

    out: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        walls, jobs, batches = [], [], []
        for it in range(iters):
            progress_rows.clear()
            j0 = next_job_id()
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            # listener events arrive async — give the bus a moment
            time.sleep(1.0)
            walls.append(round(wall, 3))
            jobs.append(next_job_id() - j0)
            batches.append(list(progress_rows))
        out[name] = {"walls": walls, "jobs": jobs, "batches": batches[-1]}
        tot = {}
        for b in batches[-1]:
            for k, v in b["durationMs"].items():
                tot[k] = tot.get(k, 0) + v
        print(
            f"{name}: walls={walls} jobs={jobs} "
            f"n_batches={len(batches[-1])} durationMs_total={tot}"
        )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
