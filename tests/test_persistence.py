"""Persistence round-trips: run_indexer Parquet write (A5→A8/A11 path,
incl. partition_by_type layout) and write_fts_index term bucketing."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dogsheep_beta_spark.indexer import build_search_index, run_indexer
from dogsheep_beta_spark.operators.fts_index import build_fts_index, write_fts_index

CONFIG = {
    "dogs.db": {
        "dogs": {
            "sql": """
                select id as key, name as title, created as timestamp,
                       case name when 'Cleo' then 1 else 2 end as category,
                       likes as search_1
                from dogs
            """
        }
    }
}


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="dbs_persist_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def dogs_source(spark):
    spark.createDataFrame(
        [
            (1, "Cleo", "running", 5, "2020-08-22 04:41:33"),
            (2, "Pancakes", "chasing", 4, "2020-08-17 11:35:42"),
        ],
        "id int, name string, likes string, age int, created string",
    ).createOrReplaceTempView("dogs")


def test_run_indexer_roundtrip(spark, dogs_source, tmpdir):
    out = os.path.join(tmpdir, "index")
    df = run_indexer(spark, CONFIG, out)
    # re-read equals the in-flight build, including defaults and coercions
    mem = {r["key"]: r.asDict() for r in build_search_index(spark, CONFIG).collect()}
    disk = {r["key"]: r.asDict() for r in df.collect()}
    assert disk == mem
    assert disk["1"]["is_public"] == 0 and disk["1"]["search_2"] is None


def test_run_indexer_partitioned_by_type(spark, dogs_source, tmpdir):
    out = os.path.join(tmpdir, "index_part")
    run_indexer(spark, CONFIG, out, partition_by_type=True)
    # hive-style layout -> per-type partition pruning at scale
    assert any(p.startswith("type=") for p in os.listdir(out))
    got = spark.read.parquet(out)
    assert got.filter(F.col("type") == "dogs.db/dogs").count() == 2


def test_run_indexer_compaction_and_sort(spark, dogs_source, tmpdir):
    out = os.path.join(tmpdir, "index_compact")
    run_indexer(spark, CONFIG, out, compact_partitions=1, sort_by_timestamp=True)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 1  # compacted into one file
    got = [r["timestamp"] for r in spark.read.parquet(out).collect()]
    # file order = timestamp desc (row-group skipping layout)
    assert got == sorted(got, reverse=True)


def test_write_ivf_partition_pruning(spark, tmpdir):
    from dogsheep_beta_spark.operators.similarity import ivf_topk, write_ivf

    from dogsheep_beta_spark.operators.similarity import centroids, read_ivf

    rows = [(i, [float(i % 2), float(1 - i % 2), 0.5], i % 2) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>, label int")
    out = os.path.join(tmpdir, "ivf")
    write_ivf(df, out, "label", "embedding")
    assert sorted(p for p in os.listdir(out) if p.startswith("label=")) == [
        "label=0",
        "label=1",
    ]
    # centroids persisted alongside (underscore dir: hidden from the
    # main scan), broadcast-sized, and equal to a fresh aggregation
    back, cents = read_ivf(spark, out)
    assert "_centroids" in os.listdir(out)
    assert [f.name for f in cents.schema.fields] == ["cell", "centroid"]
    fresh = {r["cell"]: r["centroid"] for r in centroids(df, "embedding", "label").collect()}
    for r in cents.collect():
        assert fresh[r["cell"]] == pytest.approx(r["centroid"])
    # probing 1 cell must scan only that partition (PartitionFilters)
    probe = back.filter(F.col("label") == 0)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(label" in plan
    got = ivf_topk(
        back, "vec_id", "embedding", "label", 0, k=3, nprobe=1, cents=cents
    ).collect()
    assert all(r["id"] % 2 == 0 for r in got)  # same-cell neighbors only
    # with precomputed centroids, the query plan must NOT re-aggregate
    # the full table: no posexplode (the centroid build's signature op)
    qplan = (
        ivf_topk(back, "vec_id", "embedding", "label", 0, k=3, nprobe=1, cents=cents)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "posexplode" not in qplan.lower()


def test_write_fts_index_term_buckets(spark, dogs_source, tmpdir):
    idx = build_search_index(spark, CONFIG)
    fts = build_fts_index(idx, mode="portable", stem=False)
    out = os.path.join(tmpdir, "fts")
    write_fts_index(fts, out, term_buckets=2)
    postings = spark.read.parquet(os.path.join(out, "postings"))
    mem = {
        (r["term"], r["key"], r["field"]): r["tf"] for r in fts.postings.collect()
    }
    disk = {
        (r["term"], r["key"], r["field"]): r["tf"] for r in postings.collect()
    }
    assert disk == mem and len(disk) > 0
    doclen = spark.read.parquet(os.path.join(out, "doc_lengths"))
    assert {r["key"]: r["dl"] for r in doclen.collect()} == {
        r["key"]: r["dl"] for r in fts.doc_lengths.collect()
    }


def test_fts_term_partition_pruned_search(spark, dogs_source, tmpdir):
    """The §7.5 at-rest layout end-to-end: postings hive-partitioned by
    term bucket + meta.json; read_fts_index restores a usable index
    whose exact-term MATCH lookups carry PartitionFilters (scan only
    their bucket directories), and search results equal the in-memory
    index bit-for-bit.  Prefix queries skip the (unboundable) cut but
    still answer correctly."""
    from dogsheep_beta_spark.operators.fts_index import (
        build_fts_index,
        read_fts_index,
        write_fts_index,
    )
    from dogsheep_beta_spark.plans.search import search

    idx = build_search_index(spark, CONFIG)
    fts_mem = build_fts_index(idx, mode="portable", stem=False)
    out = os.path.join(tmpdir, "fts_part")
    write_fts_index(fts_mem, out, term_partitions=4)
    fts_disk = read_fts_index(spark, out)
    assert fts_disk.term_partitions == 4
    assert fts_disk.n_docs == fts_mem.n_docs
    assert fts_disk.avgdl == fts_mem.avgdl

    for q in ("running", "chasing", "runn*"):
        mem = [(r["type"], r["key"], r["rank"])
               for r in search(idx, fts_mem, q).collect()]
        disk = [(r["type"], r["key"], r["rank"])
                for r in search(idx, fts_disk, q).collect()]
        assert mem == disk, q

    from dogsheep_beta_spark.plans.match import parse_match, compile_match
    from dogsheep_beta_spark.functions.tokenizer import analyze_py

    ast = parse_match("running", lambda s: analyze_py(s, "portable", False))
    docset, _ = compile_match(ast, fts_disk)
    plan = docset._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "term_pfx" in plan
    # the pruned scan must list FEWER than all 4 bucket dirs
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*term_pfx[^\]]*)\]", plan)
    assert m, plan[:500]


def test_fts_prefix_scheme_prunes_exact_and_prefix(spark, dogs_source, tmpdir):
    """The lexicographic term layout (term_scheme="prefix"): results
    identical to the in-memory index for exact, stemless AND prefix
    queries, and — unlike the hash layout — a ``prefix*`` MATCH carries
    PartitionFilters on the first-2-chars directory key."""
    from dogsheep_beta_spark.functions.tokenizer import analyze_py
    from dogsheep_beta_spark.operators.fts_index import (
        build_fts_index,
        read_fts_index,
        write_fts_index,
    )
    from dogsheep_beta_spark.plans.match import compile_match, parse_match
    from dogsheep_beta_spark.plans.search import search

    idx = build_search_index(spark, CONFIG)
    fts_mem = build_fts_index(idx, mode="portable", stem=False)
    out = os.path.join(tmpdir, "fts_prefix")
    write_fts_index(fts_mem, out, term_scheme="prefix")
    fts_disk = read_fts_index(spark, out)
    assert fts_disk.term_scheme == "prefix"
    assert fts_disk.term_partitions == 0

    for q in ("running", "chasing", "runn*", "r*", '"running" OR chas*'):
        mem = [(r["type"], r["key"], r["rank"])
               for r in search(idx, fts_mem, q).collect()]
        disk = [(r["type"], r["key"], r["rank"])
                for r in search(idx, fts_disk, q).collect()]
        assert mem == disk, q

    def match_plan(q):
        ast = parse_match(q, lambda s: analyze_py(s, "portable", False))
        docset, _ = compile_match(ast, fts_disk)
        return docset._jdf.queryExecution().executedPlan().toString()

    # exact term: equality partition filter on the directory key
    plan = match_plan("running")
    assert "PartitionFilters" in plan and "term_pfx" in plan
    assert "pru" in plan  # "p" + "ru"
    # prefix with >= 2 chars: ALSO pruned (the hash layout can't)
    plan = match_plan("runn*")
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*term_pfx[^\]]*)\]", plan)
    assert m and "pru" in m.group(1), plan[:800]
    # single-char prefix: StartsWith directory cut
    plan = match_plan("r*")
    m = re.search(r"PartitionFilters: \[([^\]]*term_pfx[^\]]*)\]", plan)
    assert m and "StartsWith" in m.group(1), plan[:800]


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Footer-level data-skipping evidence for the Morton layout: with
    rows clustered by interleaved (type-hash, day) bits, BOTH a type
    equality filter and a day range filter overlap only a small
    fraction of the files' min/max stats — while the 1-D
    timestamp-sorted layout prunes only its own dimension and the
    type filter must open every file."""
    import glob

    import pyarrow.parquet as pq

    from dogsheep_beta_spark.operators.zorder import write_zordered

    from datetime import datetime, timedelta, timezone

    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [
        (f"type_{i % 4}", i, base + timedelta(days=(i // 4) % 256))
        for i in range(32_768)
    ]
    df = spark.createDataFrame(rows, "type string, key long, ts timestamp")

    zpath = str(tmp_path / "zorder")
    tpath = str(tmp_path / "tsorted")
    write_zordered(df, zpath, [("type", "hash"), ("ts", "day")], n_files=32)
    (
        df.repartitionByRange(32, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(tpath)
    )

    def stats(path):
        out = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            tmin = tmax = dmin = dmax = None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    st = col.statistics
                    if st is None:
                        continue
                    if col.path_in_schema == "type":
                        tmin = st.min if tmin is None else min(tmin, st.min)
                        tmax = st.max if tmax is None else max(tmax, st.max)
                    elif col.path_in_schema == "ts":
                        dmin = st.min if dmin is None else min(dmin, st.min)
                        dmax = st.max if dmax is None else max(dmax, st.max)
            out.append((tmin, tmax, dmin, dmax))
        return out

    zstats, tstats = stats(zpath), stats(tpath)
    assert len(zstats) == 32 and len(tstats) == 32

    def hits_type(ss, t):
        return sum(1 for tmin, tmax, _, _ in ss if tmin <= t <= tmax)

    def hits_days(ss, lo, hi):
        return sum(
            1 for _, _, dmin, dmax in ss
            if dmin is not None and not (dmax < lo or dmin > hi)
        )

    # type equality: z-order bounds each file to a slice of type space;
    # the timestamp layout interleaves all types through every file.
    assert hits_type(tstats, "type_2") == 32
    assert hits_type(zstats, "type_2") <= 16

    # day range (16 of 256 days): both layouts prune, z-order must
    # still skip at least half the files despite ALSO clustering type.
    lo, hi = base + timedelta(days=100), base + timedelta(days=115)
    assert hits_days(tstats, lo, hi) <= 4
    assert hits_days(zstats, lo, hi) <= 16

    # the layout is invisible to values: same result set either way.
    a = spark.read.parquet(zpath).orderBy("key").collect()
    b = spark.read.parquet(tpath).orderBy("key").collect()
    assert a == b


def test_run_indexer_zorder_layout_value_neutral(spark, tmp_path):
    """run_indexer(zorder=True): Morton clustering is a pure physical
    layout — the persisted index holds exactly the rows of the plain
    build, and the write lands the requested file count."""
    import glob

    from dogsheep_beta_spark.indexer import run_indexer

    rows = [
        (i, f"dog{i}", "running fast", f"2020-08-{(i % 27) + 1:02d} 04:00:00")
        for i in range(64)
    ]
    spark.createDataFrame(
        rows, "id int, name string, likes string, created string"
    ).createOrReplaceTempView("dogs")
    config = {
        "dogs.db": {
            "dogs": {
                "sql": """
                    select id as key, name as title,
                           created as timestamp, likes as search_1
                    from dogs
                """
            }
        }
    }
    plain = run_indexer(
        spark, config, str(tmp_path / "plain")
    ).orderBy("key").collect()
    zord = run_indexer(
        spark, config, str(tmp_path / "zord"), zorder=True,
        compact_partitions=4,
    ).orderBy("key").collect()
    assert zord == plain
    assert len(glob.glob(str(tmp_path / "zord" / "*.parquet"))) == 4


def test_zorder_key_matches_python_morton(spark):
    """The codegen bit-interleave equals a literal Python Morton
    encode, including negative-modulo day handling."""
    from dogsheep_beta_spark.operators.zorder import zorder_key

    from pyspark.sql import functions as F

    bits = 6
    vals = [(a, b) for a in (0, 1, 5, 63, 64, 130) for b in (0, 2, 63, 100)]
    df = spark.createDataFrame(vals, "a long, b long")
    got = (
        df.withColumn(
            "z", zorder_key([(F.col("a"), "int"), (F.col("b"), "int")], bits=bits)
        )
        .orderBy("a", "b")
        .collect()
    )

    def morton(a, b):
        a %= 1 << bits
        b %= 1 << bits
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for r in got:
        assert r["z"] == morton(r["a"], r["b"]), (r["a"], r["b"])
