"""Object-store commit backend (storage/objectstore.py, VERDICT r11 #1).

The protocol under test uses ONLY conditional-put / get / list /
delete — no rename, no symlink, no lockfile — so a green suite here is
evidence the streamed-layout commit story survives an S3-class store.
The crash-injection sweep reuses the exact `_sweep_crash_points`
machinery the POSIX backend is held to (tests/test_streaming.py).
"""

import os
import threading

import pytest

from dogsheep_beta_spark.storage.objectstore import (
    EmulatedObjectStore,
    append_objectstore,
    compact_objectstore,
    layout_history,
    merge_ivf_batch_objectstore,
    read_latest_record,
    read_layout_objectstore,
    streaming_ivf_upsert_objectstore,
    vacuum_objectstore,
)

# ---------------------------------------------------------------------------
# shim semantics
# ---------------------------------------------------------------------------


def test_store_conditional_put_and_immutability(tmpdir):
    st = EmulatedObjectStore(os.path.join(tmpdir, "bucket"))
    assert st.put_if_absent("a/b.json", b"one")
    assert not st.put_if_absent("a/b.json", b"two")  # loser changes nothing
    assert st.get("a/b.json") == b"one"
    assert st.exists("a/b.json") and not st.exists("a/c.json")
    assert st.list("a/") == ["a/b.json"]
    assert st.delete("a/b.json") and not st.delete("a/b.json")
    assert st.list() == []


def test_store_put_file_copies_bytes(tmpdir):
    st = EmulatedObjectStore(os.path.join(tmpdir, "bucket"))
    src = os.path.join(tmpdir, "src.bin")
    with open(src, "wb") as f:
        f.write(b"payload")
    assert st.put_file_if_absent("k", src)
    with open(src, "wb") as f:
        f.write(b"MUTATED")  # later source edits must not leak in
    assert st.get("k") == b"payload"


def test_store_rejects_traversal_keys(tmpdir):
    st = EmulatedObjectStore(os.path.join(tmpdir, "bucket"))
    with pytest.raises(ValueError):
        st.put_if_absent("../escape", b"x")
    with pytest.raises(ValueError):
        st.get("")


def test_store_api_is_rename_free():
    """The contract the whole module rests on: the store exposes no
    rename/overwrite/symlink surface for the protocol to lean on."""
    banned = {"rename", "replace", "symlink", "move", "copy", "put"}
    public = {n for n in dir(EmulatedObjectStore) if not n.startswith("_")}
    assert public & banned == set()


def test_concurrent_conditional_put_single_winner(tmpdir):
    st = EmulatedObjectStore(os.path.join(tmpdir, "bucket"))
    results = [None] * 16
    barrier = threading.Barrier(16)

    def worker(i):
        barrier.wait()
        results[i] = st.put_if_absent("contested", f"{i}".encode())

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(16)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    winners = [i for i, r in enumerate(results) if r]
    assert len(winners) == 1
    assert st.get("contested") == f"{winners[0]}".encode()


# ---------------------------------------------------------------------------
# commit-log protocol
# ---------------------------------------------------------------------------


def _stage(spark, tmpdir, rows, name):
    """Write rows as a cell-partitioned parquet staging dir."""
    d = os.path.join(tmpdir, name)
    (
        spark.createDataFrame(rows, "vec_id long, cell int")
        .write.mode("overwrite").partitionBy("cell").parquet(d)
    )
    return d


def _vecs(spark, store, prefix, generation=None):
    return sorted(
        (r["vec_id"], r["cell"])
        for r in read_layout_objectstore(
            spark, store, prefix, generation
        ).collect()
    )


def test_append_commit_read_roundtrip(spark, tmpdir):
    st = EmulatedObjectStore(os.path.join(tmpdir, "bucket"))
    assert append_objectstore(
        st, "ivf", _stage(spark, tmpdir, [(1, 0), (2, 1)], "s1"), token="b0"
    )
    assert append_objectstore(
        st, "ivf", _stage(spark, tmpdir, [(3, 0)], "s2"), token="b1"
    )
    assert _vecs(spark, st, "ivf") == [(1, 0), (2, 1), (3, 0)]
    rec = read_latest_record(st, "ivf")
    assert rec["generation"] == 2 and rec["tokens"] == ["b0", "b1"]
    # every referenced object exists; partition dirs survived upload
    assert all(st.exists(f"ivf/data/{f}") for f in rec["files"])
    assert any(f.startswith("cell=") for f in rec["files"])


def test_append_replay_token_is_dropped(spark, tmpdir):
    st = EmulatedObjectStore(os.path.join(tmpdir, "bucket"))
    assert append_objectstore(
        st, "ivf", _stage(spark, tmpdir, [(1, 0)], "s1"), token="b0"
    )
    # redelivery of the same batch (crash between commit and stream
    # checkpoint advance): recognized, dropped, layout unchanged
    assert not append_objectstore(
        st, "ivf", _stage(spark, tmpdir, [(1, 0)], "s1r"), token="b0"
    )
    assert not append_objectstore(
        st, "ivf", _stage(spark, tmpdir, [(1, 0)], "s1l"),
        token="new:b0", legacy_tokens=("b0",),
    )
    assert _vecs(spark, st, "ivf") == [(1, 0)]
    assert read_latest_record(st, "ivf")["generation"] == 1


def test_concurrent_appenders_merge_not_clobber(spark, tmpdir):
    """Two writers racing the same generation number: the loser's
    conditional put fails, it re-reads and re-merges — both batches
    land, exactly once each, with no lock anywhere."""
    st = EmulatedObjectStore(os.path.join(tmpdir, "bucket"))
    stages = [
        _stage(spark, tmpdir, [(i, i % 2)], f"c{i}") for i in range(6)
    ]
    errs = []
    barrier = threading.Barrier(6)

    def worker(i):
        try:
            barrier.wait()
            append_objectstore(st, "ivf", stages[i], token=f"t{i}")
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert errs == []
    assert _vecs(spark, st, "ivf") == [(i, i % 2) for i in range(6)]
    hist = layout_history(st, "ivf")
    assert [r["generation"] for r in hist] == list(range(1, 7))
    assert sorted(hist[-1]["tokens"]) == [f"t{i}" for i in range(6)]


def test_compact_preserves_content_and_tokens(spark, tmpdir):
    st = EmulatedObjectStore(os.path.join(tmpdir, "bucket"))
    for b in range(3):
        append_objectstore(
            st, "ivf",
            _stage(spark, tmpdir, [(b * 2, 0), (b * 2 + 1, 1)], f"s{b}"),
            token=f"b{b}",
        )
    before = _vecs(spark, st, "ivf")
    rec = compact_objectstore(spark, st, "ivf")
    assert rec["action"] == "compact" and rec["compacted_from"] == 3
    assert _vecs(spark, st, "ivf") == before
    # file count shrank to one object per cell; tokens carried over
    assert len(rec["files"]) == 2 < len(layout_history(st, "ivf")[2]["files"])
    assert rec["tokens"] == ["b0", "b1", "b2"]
    # replay detection survives compaction
    assert not append_objectstore(
        st, "ivf", _stage(spark, tmpdir, [(9, 0)], "sr"), token="b1"
    )


def test_compact_concurrent_append_survives(spark, tmpdir):
    """An append that commits between the compactor's snapshot and its
    commit must survive verbatim in the compacted record (the
    late-files re-merge — the lock-free analog of the POSIX
    late-file-migration window)."""
    from dogsheep_beta_spark.storage import objectstore as osm

    st = EmulatedObjectStore(os.path.join(tmpdir, "bucket"))
    for b in range(2):
        append_objectstore(
            st, "ivf", _stage(spark, tmpdir, [(b, 0)], f"s{b}"), token=f"b{b}"
        )
    late_stage = _stage(spark, tmpdir, [(7, 1)], "late")
    orig = osm._upload_staging
    fired = {"done": False}

    def upload_then_append(store, prefix, staging_dir):
        out = orig(store, prefix, staging_dir)
        if not fired["done"]:
            fired["done"] = True  # exactly once: inside the compactor
            append_objectstore(store, prefix, late_stage, token="late")
        return out

    osm._upload_staging = upload_then_append
    try:
        rec = compact_objectstore(spark, st, "ivf")
    finally:
        osm._upload_staging = orig
    assert fired["done"]
    assert _vecs(spark, st, "ivf") == [(0, 0), (1, 0), (7, 1)]
    assert "late" in rec["tokens"]


def test_time_travel_and_vacuum_horizon(spark, tmpdir):
    st = EmulatedObjectStore(os.path.join(tmpdir, "bucket"))
    for b in range(3):
        append_objectstore(
            st, "ivf", _stage(spark, tmpdir, [(b, b % 2)], f"s{b}"),
            token=f"b{b}",
        )
    assert _vecs(spark, st, "ivf", generation=1) == [(0, 0)]
    assert _vecs(spark, st, "ivf", generation=2) == [(0, 0), (1, 1)]
    with pytest.raises(ValueError):
        read_layout_objectstore(spark, st, "ivf", generation=99)
    compact_objectstore(spark, st, "ivf")
    # orphan from a "crashed upload" (never referenced by any record)
    st.put_if_absent("ivf/data/cell=0/deadbeef-orphan.parquet", b"junk")
    deleted = vacuum_objectstore(st, "ivf", keep_generations=2)
    assert any(k.endswith("deadbeef-orphan.parquet") for k in deleted)
    # retained horizon still reads (latest + one back — and since
    # appends only ADD files, every pre-compaction generation whose
    # files gen 3 still references stays readable too)
    assert _vecs(spark, st, "ivf") == [(0, 0), (1, 1), (2, 0)]
    assert _vecs(spark, st, "ivf", generation=3) == [(0, 0), (1, 1), (2, 0)]
    assert _vecs(spark, st, "ivf", generation=1) == [(0, 0)]
    # tighten retention to the compacted generation only: the
    # pre-compaction snapshots are swept and fail LOUDLY, not partially
    vacuum_objectstore(st, "ivf", keep_generations=1)
    assert _vecs(spark, st, "ivf") == [(0, 0), (1, 1), (2, 0)]
    with pytest.raises(FileNotFoundError, match="retention horizon"):
        read_layout_objectstore(spark, st, "ivf", generation=1)
    with pytest.raises(FileNotFoundError, match="retention horizon"):
        read_layout_objectstore(spark, st, "ivf", generation=3)


def test_vacuum_age_guard_protects_inflight_upload(spark, tmpdir):
    st = EmulatedObjectStore(os.path.join(tmpdir, "bucket"))
    append_objectstore(
        st, "ivf", _stage(spark, tmpdir, [(1, 0)], "s1"), token="b0"
    )
    st.put_if_absent("ivf/data/cell=0/ffff-inflight.parquet", b"x")
    assert vacuum_objectstore(st, "ivf", min_age_sec=3600.0) == []
    assert st.exists("ivf/data/cell=0/ffff-inflight.parquet")


# ---------------------------------------------------------------------------
# streamed IVF layout end-to-end on the backend
# ---------------------------------------------------------------------------


def _cents(spark):
    from dogsheep_beta_spark.operators.similarity import centroids

    seed = spark.createDataFrame(
        [(i, [float(i % 2), 1.0], i % 2) for i in range(4)],
        "vec_id long, embedding array<double>, label int",
    )
    return centroids(seed, "embedding", "label")


def test_streaming_ivf_upsert_objectstore_converges(spark, tmpdir):
    """The full wiring: an embedding stream through foreachBatch onto
    the object-store backend equals the batch Voronoi assignment —
    the same convergence contract as the POSIX streaming_ivf_upsert."""
    from dogsheep_beta_spark.operators.similarity import voronoi_assign

    cents = _cents(spark)
    rows = [(i, [float(i % 2), 1.0]) for i in range(20)]
    src = os.path.join(tmpdir, "src")
    bdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bdf.repartition(4).write.parquet(src)
    st = EmulatedObjectStore(os.path.join(tmpdir, "bucket"))
    stream = (
        spark.readStream.schema(bdf.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = streaming_ivf_upsert_objectstore(
        stream, cents, st, "ivf", os.path.join(tmpdir, "ckpt")
    )
    q.awaitTermination(120)
    want = sorted(
        (r["vec_id"], r["cell"])
        for r in voronoi_assign(bdf, "vec_id", "embedding", cents)
        .select("vec_id", "cell").collect()
    )
    assert _vecs(spark, st, "ivf") == want
    # restart with the SAME checkpoint: nothing new → no double-append
    q2 = streaming_ivf_upsert_objectstore(
        stream, cents, st, "ivf", os.path.join(tmpdir, "ckpt")
    )
    q2.awaitTermination(120)
    assert _vecs(spark, st, "ivf") == want


def test_compact_crash_at_every_boundary_is_recoverable(spark, tmpdir):
    """Compaction on the no-rename backend dies at EVERY store
    boundary (each compacted-object upload + the log put): the layout
    must stay readable at the pre-compaction snapshot after every
    crash (orphaned uploads are invisible until the log record lands),
    and a clean re-run must converge — with vacuum sweeping the dead
    attempts' objects afterward."""
    from dogsheep_beta_spark.storage import objectstore as osm

    class CountingStore(EmulatedObjectStore):
        def __init__(self, backing, fail_at=None):
            super().__init__(backing)
            self.events = 0
            self.fail_at = fail_at

        def _tick(self):
            e = self.events
            self.events += 1
            if self.fail_at is not None and e == self.fail_at:
                raise RuntimeError(f"injected at store event {e}")

        def put_if_absent(self, key, data):
            self._tick()
            return super().put_if_absent(key, data)

        def put_file_if_absent(self, key, src):
            self._tick()
            return super().put_file_if_absent(key, src)

    def fresh(fail_at=None, tag="c"):
        st = CountingStore(
            os.path.join(tmpdir, f"bucket_{tag}_{fail_at}"), fail_at
        )
        for b in range(3):
            append_objectstore(
                st, "ivf",
                _stage(spark, tmpdir, [(b * 2, 0), (b * 2 + 1, 1)],
                       f"{tag}{fail_at}s{b}"),
                token=f"b{b}",
            )
        return st

    # count the boundaries of an uninterrupted compaction
    ref = fresh(tag="ref")
    want = _vecs(spark, ref, "ivf")
    compact_objectstore(spark, ref, "ivf")
    n_events = ref.events
    baseline_appends = fresh(tag="cnt").events  # events before compact
    n_compact_events = n_events - baseline_appends
    assert n_compact_events >= 3  # >=2 cell objects + 1 log put

    for fp in range(baseline_appends, n_events):
        st = fresh(fail_at=fp, tag="f")
        with pytest.raises(RuntimeError, match="injected"):
            compact_objectstore(spark, st, "ivf")
        st.fail_at = None
        # crashed mid-compaction: the committed snapshot is intact
        assert _vecs(spark, st, "ivf") == want, fp
        # re-run converges; vacuum sweeps the dead attempt's orphans
        rec = compact_objectstore(spark, st, "ivf")
        assert rec["action"] == "compact"
        assert _vecs(spark, st, "ivf") == want, fp
        deleted = vacuum_objectstore(st, "ivf", keep_generations=1)
        assert _vecs(spark, st, "ivf") == want, fp
        live = set(rec["files"])
        dp = "ivf/data"
        leftover = {k[len(dp) + 1:] for k in st.list(dp)}
        assert leftover == live, (fp, leftover - live, deleted)


# ---------------------------------------------------------------------------
# multi-table FTS layout on the backend (A10 port)
# ---------------------------------------------------------------------------

_FTS_SCHEMA = "key int, title string, search_1 string"
_FTS_BATCHES = [
    [(1, "alpha beta", "gamma"), (2, "beta beta", None)],
    [(2, "delta", "beta gamma"), (3, "alpha", "alpha")],  # updates 2
    [(1, "omega", None), (4, "epsilon zeta", "eta")],     # updates 1
]


def _canon_post(df):
    return sorted(
        (r["term"], r["key"], r["field"], r["tf"], tuple(r["positions"]))
        for r in df.collect()
    )


def test_fts_objectstore_converges_and_searches(spark, tmpdir):
    """The A10 incremental FTS maintenance on the no-rename backend:
    after N merged batches the committed snapshot equals the full
    batch FTS rebuild over the final corpus (the same convergence
    contract as the POSIX `incremental_fts_stream`), replays are
    dropped by token, and BM25 search over the RESTORED FtsIndex
    (corpus stats derived from the snapshot's own doc_lengths) equals
    search over the in-memory build."""
    from pyspark.sql import functions as F

    from dogsheep_beta_spark.operators.fts_index import build_fts_index
    from dogsheep_beta_spark.plans.search import scored_docs
    from dogsheep_beta_spark.storage.objectstore import (
        merge_fts_batch_objectstore,
        read_fts_objectstore,
        read_table_objectstore,
    )

    st = EmulatedObjectStore(os.path.join(tmpdir, "bucket"))
    for b, rows in enumerate(_FTS_BATCHES):
        bdf = spark.createDataFrame(rows, _FTS_SCHEMA)
        assert merge_fts_batch_objectstore(
            spark, bdf, b, st, "fts", "s.db/t", commit_token=f"batch:{b}"
        )
    # replay of the last batch: recognized BEFORE any Spark work
    assert not merge_fts_batch_objectstore(
        spark,
        spark.createDataFrame(_FTS_BATCHES[-1], _FTS_SCHEMA),
        2, st, "fts", "s.db/t", commit_token="batch:2",
    )

    idx_df, fts_disk = read_fts_objectstore(spark, st, "fts")
    batch_fts = build_fts_index(idx_df, persist=False)
    assert _canon_post(fts_disk.postings) == _canon_post(batch_fts.postings)
    assert sorted(
        (r["key"], r["dl"]) for r in fts_disk.doc_lengths.collect()
    ) == sorted((r["key"], r["dl"]) for r in batch_fts.doc_lengths.collect())
    assert (fts_disk.n_docs, round(fts_disk.avgdl, 9)) == (
        batch_fts.n_docs, round(batch_fts.avgdl, 9)
    )
    # last-writer-wins held across generations
    titles = {r["key"]: r["title"] for r in idx_df.collect()}
    assert titles == {"1": "omega", "2": "delta", "3": "alpha", "4": "epsilon zeta"}
    # search parity on the restored index
    for q in ("alpha", "beta gamma", "epsil*"):
        disk = sorted(
            (r["key"], round(r["rank"], 9))
            for r in scored_docs(fts_disk, q).collect()
        )
        mem = sorted(
            (r["key"], round(r["rank"], 9))
            for r in scored_docs(batch_fts, q).collect()
        )
        assert disk == mem, q
    batch_fts.postings.unpersist(), batch_fts.doc_lengths.unpersist()


def test_fts_objectstore_every_generation_is_consistent_triple(spark, tmpdir):
    """The atomicity upgrade over the POSIX stage-all-publish-last
    protocol: a reader can never pair new postings with a stale index,
    because every log record carries all three tables of ONE commit.
    Checked by self-consistency of EVERY committed generation: the
    (type, key) doc set agrees across index / postings / doc_lengths
    within each snapshot, and each generation's doc_lengths reproduce
    a fresh tokenization of that generation's own index."""
    from dogsheep_beta_spark.operators.fts_index import postings_and_lengths
    from dogsheep_beta_spark.storage.objectstore import (
        layout_history as hist,
        merge_fts_batch_objectstore,
        read_table_objectstore,
    )

    st = EmulatedObjectStore(os.path.join(tmpdir, "bucket"))
    for b, rows in enumerate(_FTS_BATCHES):
        merge_fts_batch_objectstore(
            spark, spark.createDataFrame(rows, _FTS_SCHEMA),
            b, st, "fts", "s.db/t", commit_token=f"batch:{b}",
        )
    gens = [r["generation"] for r in hist(st, "fts")]
    assert gens == [1, 2, 3]
    for g in gens:
        idx = read_table_objectstore(spark, st, "fts", "index", g)
        post = read_table_objectstore(spark, st, "fts", "postings", g)
        dl = read_table_objectstore(spark, st, "fts", "doc_lengths", g)
        keys_idx = {(r["type"], r["key"]) for r in idx.collect()}
        keys_dl = {(r["type"], r["key"]) for r in dl.collect()}
        assert keys_idx == keys_dl, g
        assert {
            (r["type"], r["key"]) for r in post.collect()
        } <= keys_idx, g
        want_post, want_dl = postings_and_lengths(idx)
        assert _canon_post(post) == _canon_post(want_post), g
        assert sorted((r["key"], r["dl"]) for r in dl.collect()) == sorted(
            (r["key"], r["dl"]) for r in want_dl.collect()
        ), g


def test_streaming_fts_objectstore_wiring(spark, tmpdir):
    """The full stream wiring: two availableNow runs over a growing
    source through `streaming_fts_objectstore` — same checkpoint, so
    run 2 merges only the new file; restart with nothing new is a
    no-op (token replay detection across stream restarts)."""
    from dogsheep_beta_spark.operators.fts_index import build_fts_index
    from dogsheep_beta_spark.storage.objectstore import (
        layout_history as hist,
        read_fts_objectstore,
        streaming_fts_objectstore,
    )

    src = os.path.join(tmpdir, "src")
    ckpt = os.path.join(tmpdir, "ckpt")
    st = EmulatedObjectStore(os.path.join(tmpdir, "bucket"))
    rows1, rows2 = _FTS_BATCHES[0], _FTS_BATCHES[1]
    spark.createDataFrame(rows1, _FTS_SCHEMA).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = streaming_fts_objectstore(
            spark, stream, st, "fts", "s.db/t", ckpt
        )
        q.awaitTermination(120)

    run()
    spark.createDataFrame(rows2, _FTS_SCHEMA).write.mode("append").parquet(src)
    run()
    n_gens = len(hist(st, "fts"))
    run()  # nothing new: no extra generation
    assert len(hist(st, "fts")) == n_gens
    idx_df, fts_disk = read_fts_objectstore(spark, st, "fts")
    batch_fts = build_fts_index(idx_df, persist=False)
    assert _canon_post(fts_disk.postings) == _canon_post(batch_fts.postings)
    titles = {r["key"]: r["title"] for r in idx_df.collect()}
    assert titles == {"1": "alpha beta", "2": "delta", "3": "alpha"}
    batch_fts.postings.unpersist(), batch_fts.doc_lengths.unpersist()
