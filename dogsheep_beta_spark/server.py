"""Minimal HTTP serving mode — the literal counterpart of the
reference's route registration (reference dogsheep_beta/__init__.py:
261-263 registers ``/-/beta`` via Datasette's ``register_routes``).

The engine's page layer already produces the complete beta.html
document (``page.beta_page``, golden-tested against the reference's
BeautifulSoup assertions); this module only puts a socket in front of
it, with the stdlib ``http.server`` — no web framework, matching the
repo's no-extra-dependency stance.

One SparkSession, one loaded index, one FTS build serve EVERY request
(the reference's one-index-many-queries lifecycle): the caller passes
them in, the handler closes over them.  ``ThreadingHTTPServer`` +
Spark's thread-safe job submission means concurrent requests simply
become concurrent Spark jobs; per-request work is the compiled page
plan (persisted filtered set, broadcast hydration joins), so request
latency is the same as one ``beta_page`` call.
"""

from __future__ import annotations

import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

ROUTES = ("/-/beta", "/")  # reference path + a convenience root alias

# generation token of (idx, postings, doc_lengths) → (n_docs, avgdl);
# see _generation_token / load_live_snapshot.  Guarded by a lock:
# ThreadingHTTPServer handlers mutate it concurrently.
_SCALAR_CACHE: dict = {}
_SCALAR_LOCK = threading.Lock()


def _make_handler_class(spark, acquire, release, rules, template_debug):
    """The ONE request-handler shape for both serve modes: route check,
    args parsing, page render, response — the modes differ only in how
    a request acquires (index_df, fts) and what it releases after.
    (Two hand-maintained near-copies had already drifted before
    round 6.)"""
    from dogsheep_beta_spark.page import beta_page

    class BetaHandler(BaseHTTPRequestHandler):
        server_version = "dogsheep-beta-spark"

        def do_GET(self):  # noqa: N802 (stdlib naming)
            u = urlparse(self.path)
            if u.path not in ROUTES:
                self._respond(404, "not found\n", "text/plain")
                return
            # first value wins per key, like Datasette's request.args
            args = {k: v[0] for k, v in parse_qs(u.query).items()}
            fts = None
            try:
                index_df, fts = acquire()
                html = beta_page(
                    spark, index_df, fts, args, rules, template_debug
                )
            except Exception as e:  # surface, don't kill the server
                self._respond(500, f"error: {e}\n", "text/plain")
                return
            finally:
                if fts is not None:
                    release(fts)  # even on failed requests
            self._respond(200, html, "text/html; charset=utf-8")

        def _respond(self, code: int, body: str, ctype: str) -> None:
            data = body.encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return BetaHandler


def make_handler(spark, index_df, fts, rules=None, template_debug=False):
    """Static-index handler: one loaded (index_df, fts) serves every
    request; nothing to release per request (phrase-hit caches are
    bounded by the FtsIndex-level LRU)."""
    return _make_handler_class(
        spark,
        acquire=lambda: (index_df, fts),
        release=lambda fts: None,
        rules=rules,
        template_debug=template_debug,
    )


def make_server(
    spark,
    index_df,
    fts,
    rules=None,
    host: str = "127.0.0.1",
    port: int = 8001,
    template_debug: bool = False,
) -> ThreadingHTTPServer:
    """Bound-but-not-running server (port 0 → ephemeral, for tests);
    call ``serve_forever()`` / ``shutdown()`` on the result."""
    handler = make_handler(spark, index_df, fts, rules, template_debug)
    return ThreadingHTTPServer((host, port), handler)


def _generation_token(path: str) -> tuple:
    """A token that changes exactly when a new generation publishes
    under ``path`` — the corpus-scalar cache key.

    Monolithic stream layout: ``path`` IS a symlink whose target is the
    version dir, so its realpath identifies the generation.  PARTITIONED
    layout: ``path`` is a plain directory whose realpath never changes —
    only the per-partition ``type=*`` symlinks inside it are cut over —
    so the token must include each partition link's resolved target
    (one listdir + one readlink per partition: cheap, no Spark jobs)."""
    real = os.path.realpath(path.rstrip("/"))
    parts: list = []
    try:
        for e in sorted(os.listdir(real)):
            child = os.path.join(real, e)
            if os.path.islink(child):
                parts.append((e, os.path.realpath(child)))
    except OSError:
        pass
    return (real, tuple(parts))


def load_live_snapshot(spark, index_path, fts_path, mode="portable", stem=False):
    """(index_df, FtsIndex) pinned to the CURRENT committed generation
    of a layout that a streaming merge (``merge_fts_batch``) is
    actively appending to.

    Each artifact publishes via atomic symlink cutover
    (``_publish_dir``), so resolving the symlink ONCE and reading the
    resolved version dir yields a complete generation — never a
    half-written mixture (a publish during the request is invisible;
    the resolved dir survives one further publish under the retention
    policy, the same horizon as manifest time travel).  Corpus scalars
    (n_docs, avgdl) are memoized per generation TOKEN
    (``_generation_token``): for the monolithic layout that is the
    resolved version dir, for the partitioned layout it includes every
    partition symlink's target — so a publish in EITHER layout misses
    the cache and recomputes, while steady-state requests pay zero
    extra jobs.

    This is the reference's trigger-maintained-FTS story
    (reference dogsheep_beta/utils.py:90: SQLite triggers keep
    search_index_fts in sync while Datasette serves from the same db
    file) made real at engine scale: writer and server share nothing
    but the published layout.

    Isolation granularity follows the layout: the monolithic stream
    layout (``incremental_fts_stream(partitioned=False)``) publishes
    whole-artifact symlinks, so a request pins complete generations of
    index/postings/doc_lengths.  The partitioned layout publishes
    per-``type=`` partition symlinks; a request then gets
    per-partition atomicity (partition A at batch N, B at N−1 for an
    instant) — the same isolation level Hive dynamic partition
    overwrite gives, documented at _publish_partitions."""
    from pyspark.sql import functions as F

    from dogsheep_beta_spark.operators.fts_index import FtsIndex

    def token3() -> tuple:
        return (
            _generation_token(index_path.rstrip("/")),
            _generation_token(os.path.join(fts_path, "postings")),
            _generation_token(os.path.join(fts_path, "doc_lengths")),
        )

    # The read paths are derived FROM the token (its first component is
    # the resolved version dir), and the token is re-checked after the
    # scalar jobs: a publish that lands between resolving the data and
    # computing the cache key would otherwise store the OLD generation's
    # scalars under the NEW generation's key — a permanently poisoned
    # cache that froze n_docs at the stale value for every later
    # request (observed as a torn snapshot under concurrent publish).
    for attempt in range(5):
        ck = token3()
        index_df = spark.read.parquet(ck[0][0])
        postings = spark.read.parquet(ck[1][0])
        doc_lengths = spark.read.parquet(ck[2][0])
        with _SCALAR_LOCK:
            cached = _SCALAR_CACHE.get(ck)
        if cached is not None:
            break
        # NULL-key rows are outside the FTS doc universe (see
        # fts_index.postings_and_lengths) — count only keyed docs so
        # live-mode scalars equal the static build's
        n_docs = index_df.where(F.col("key").isNotNull()).count()
        total = doc_lengths.agg(F.sum("dl")).collect()[0][0] or 0
        cached = (n_docs, (total / n_docs) if n_docs else 0.0)
        if token3() != ck:
            if attempt < 4:
                continue  # generation cut over mid-count: retry
            break  # give up retrying: serve the values, never cache them
        with _SCALAR_LOCK:
            _SCALAR_CACHE[ck] = cached
            while len(_SCALAR_CACHE) > 32:
                _SCALAR_CACHE.pop(next(iter(_SCALAR_CACHE)), None)
        break
    n_docs, avgdl = cached
    return index_df, FtsIndex(
        postings=postings,
        doc_lengths=doc_lengths,
        n_docs=n_docs,
        avgdl=avgdl,
        mode=mode,
        stem=stem,
    )


def make_live_handler(
    spark, index_path, fts_path, rules=None, mode="portable",
    stem=False, template_debug=False,
):
    """Handler that re-pins the index + FTS generation PER REQUEST —
    serve-while-indexing: docs appended by a concurrently running
    ``merge_fts_batch`` stream become searchable on the next request,
    no restart, and no request ever reads a partial generation (the
    symlink resolution in load_live_snapshot is the isolation
    boundary)."""
    return _make_handler_class(
        spark,
        acquire=lambda: load_live_snapshot(
            spark, index_path, fts_path, mode, stem
        ),
        # per-request FtsIndex objects are throwaway: their phrase-hit
        # caches must unpersist on request teardown or the server leaks
        release=lambda fts: fts.release_hit_caches(),
        rules=rules,
        template_debug=template_debug,
    )


def make_live_server(
    spark,
    index_path,
    fts_path,
    rules=None,
    host: str = "127.0.0.1",
    port: int = 8001,
    mode: str = "portable",
    stem: bool = False,
    template_debug: bool = False,
) -> ThreadingHTTPServer:
    """Bound-but-not-running live server (see make_live_handler)."""
    handler = make_live_handler(
        spark, index_path, fts_path, rules, mode, stem, template_debug
    )
    return ThreadingHTTPServer((host, port), handler)
