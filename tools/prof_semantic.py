"""Per-batch profile of the streaming SemDeDup merge at a given SF —
the same job-count + per-phase accounting the MinHash merge got in
round 9 (BASELINE.md).  Run:  DBS_PROFILE_STREAM=1 python
tools/prof_semantic.py [sf_dir] [n_batches]
"""
import os
import statistics
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 6

spark = (
    SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry  # noqa: E402
from dogsheep_beta_spark.streaming.incremental import (  # noqa: E402
    merge_semantic_batch,
    streaming_semantic_dedup,
)

_, cents = entry._kmeans_layout(spark, sf_dir)
emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
src = tempfile.mkdtemp(prefix="semprof_src_")
emb.repartition(n_batches).write.mode("overwrite").parquet(src)

work = tempfile.mkdtemp(prefix="semprof_store_")
ck = tempfile.mkdtemp(prefix="semprof_ck_")


def next_job_id():
    jid = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    return jid if isinstance(jid, int) else jid.get()


orig = merge_semantic_batch
job_counts = []


def counted(spark_, bdf, bid, *a, **kw):
    j0 = next_job_id()
    orig(spark_, bdf, bid, *a, **kw)
    job_counts.append((bid, next_job_id() - j0))


import dogsheep_beta_spark.streaming.incremental as inc  # noqa: E402

inc.merge_semantic_batch = counted

stream = (
    spark.readStream.schema(emb.schema)
    .option("maxFilesPerTrigger", "1")
    .parquet(src)
)
with entry._stream_partitions(spark):
    q = streaming_semantic_dedup(
        stream, work, os.path.join(ck, "c"), cents, tau=0.40
    )
    q.awaitTermination(600)

durs = [
    p["durationMs"]["triggerExecution"] / 1000.0
    for p in q.recentProgress
    if p["numInputRows"] > 0
]
steady = durs[1:] or durs
print("per-batch walls:", [round(d, 2) for d in durs])
print("median steady:", round(statistics.median(steady), 3))
print("jobs per batch:", job_counts)
spark.stop()
