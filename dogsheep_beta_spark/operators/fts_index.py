"""Full-text index build — the Spark analog of the FTS5 rebuild
(SURVEY.md §2 A9/D5; reference utils.py:57-63 delegates to SQLite FTS5).

Derived tables (all recomputed per index run, exactly like the
reference's full rebuild):

- ``postings``  (term, type, key, field, tf, positions) — the inverted
  index over the two indexed fields ``title`` + ``search_1`` ONLY
  (utils.py:90; SURVEY §1.3 invariant 3).  ``positions`` enables phrase
  queries (SURVEY §7.3 item 1).
- ``doc_lengths`` (type, key, dl) — per-row token count summed over the
  indexed fields.  FTS5's bm25 flattens columns with equal weight 1.0:
  tf and dl aggregate across columns, avgdl is the row average.
- scalar corpus stats: ``n_docs`` (ALL rows, even token-less ones) and
  ``avgdl`` — collected once per build (one tiny agg job) and inlined
  as literals so per-query scoring plans carry no extra join.

Scale notes (100 TB): the tokenize→posexplode→groupBy pipeline is one
shuffle on (term, type, key, field); partial aggregation applies.  At
rest, write postings bucketed/partitioned by term prefix so MATCH term
lookups partition-prune (SURVEY §7.5).
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dogsheep_beta_spark.functions.tokenizer import analyze_expr
from dogsheep_beta_spark.schema import FTS_FIELDS


@dataclass
class FtsIndex:
    """The in-flight full-text index over one search_index build."""

    postings: DataFrame  # term, type, key, field, tf, positions
    doc_lengths: DataFrame  # type, key, dl (summed over indexed fields)
    n_docs: int
    avgdl: float
    mode: str = "portable"
    stem: bool = False
    fields: tuple = FTS_FIELDS  # indexed columns (colspec targets, B5)
    # >0 when postings are at rest hive-partitioned by term_pfx =
    # md5-bucket(term) % term_partitions: exact-term MATCH lookups then
    # carry a partition filter and scan only their buckets' directories.
    term_partitions: int = 0
    # partitioning scheme for the at-rest layout: "hash" (md5 buckets —
    # balanced, but a prefix* query is unboundable and scans every
    # bucket) or "prefix" (term_pfx = "p" + first 2 chars of the term —
    # LEXICOGRAPHIC directory key, so exact terms AND prefix* queries
    # both partition-prune; skew follows the bigram distribution, which
    # sortWithinPartitions row-group stats absorb within a directory).
    term_scheme: str = "hash"
    # Phrase-hit cache populated by plans/match.compile_match: an LRU
    # keyed by phrase CONTENT (tokens/prefix/initial/fields), so a
    # repeated phrase across requests reuses one persisted DataFrame
    # and a long-running server (cli serve) holds at most
    # ``hit_cache_max`` persisted plans instead of growing one entry
    # per request forever.  Eviction unpersists; a concurrently
    # in-flight query over an evicted plan just recomputes (Spark
    # semantics), it never breaks.  release_hit_caches() remains the
    # index-lifetime teardown.
    hit_caches: "OrderedDict" = field(default_factory=OrderedDict)
    hit_cache_max: int = 64
    # ThreadingHTTPServer handlers share one FtsIndex: the lock keeps
    # the miss→build→insert→evict sequence atomic so two concurrent
    # requests for the same new phrase can't double-persist and a
    # racing evict can't unpersist an entry another thread just took.
    _hit_cache_lock: "threading.Lock" = field(
        default_factory=threading.Lock, repr=False
    )

    def cached_phrase_hits(self, key, builder) -> DataFrame:
        """Return the persisted hits DataFrame for a phrase cache key,
        building+persisting via ``builder()`` on miss; LRU-evict (and
        unpersist) beyond ``hit_cache_max`` entries.  The builder runs
        under the lock — it only CONSTRUCTS a plan (no Spark job), so
        the critical section stays microseconds."""
        with self._hit_cache_lock:
            cached = self.hit_caches.get(key)
            if cached is not None:
                self.hit_caches.move_to_end(key)
                return cached
            df = builder().persist()
            self.hit_caches[key] = df
            evicted = []
            while len(self.hit_caches) > self.hit_cache_max:
                _, old = self.hit_caches.popitem(last=False)
                evicted.append(old)
        for old in evicted:
            old.unpersist()
        return df

    def release_hit_caches(self) -> None:
        with self._hit_cache_lock:
            dfs, self.hit_caches = list(self.hit_caches.values()), OrderedDict()
        for df in dfs:
            df.unpersist()


def term_bucket_py(term: str, n: int) -> int:
    """Driver-side twin of the term_pfx write expression (md5-bucket,
    same scheme as operators/sampling.hash_bucket — engine-portable,
    unlike Spark's Murmur3 ``hash``)."""
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % n


def term_prefix_py(term: str) -> str:
    """Driver-side twin of the PREFIX-scheme term_pfx write expression:
    a letter sentinel + the term's first two characters.  The sentinel
    keeps hive partition-value type inference from turning digit-led
    prefixes ("12…") into an int partition column, which would break
    string comparisons against the directory key."""
    return "p" + term[:2]


def _field_tokens(index_df: DataFrame, field: str, mode: str, stem: bool) -> DataFrame:
    """(type, key, field, pos, term) for one indexed column."""
    return (
        index_df.select(
            "type",
            "key",
            F.lit(field).alias("field"),
            F.posexplode(analyze_expr(F.col(field), mode, stem)).alias("pos", "term"),
        )
    )


def postings_and_lengths(
    index_df: DataFrame,
    fields=FTS_FIELDS,
    mode: str = "portable",
    stem: bool = False,
    persist: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Tokenize → explode → aggregate: (postings, doc_lengths), no
    corpus scalars (used standalone by the incremental maintainer).

    doc_lengths is a rollup of postings (dl = Σ tf over terms+fields —
    FTS5's flattened column model, equal weights), so the corpus is
    tokenized exactly ONCE; with ``persist`` the rollup reads the
    cached postings instead of re-exploding.

    NULL-key rows are excluded: the doc identity here is (type, key),
    so rows without a key cannot be addressed by the docset join
    anyway, and letting them in would merge every NULL-key row of a
    type into one pseudo-doc (groupBy groups NULLs), corrupting tf/dl.
    The reference addresses such rows by SQLite rowid — an identity the
    engine's layout does not carry; they stay visible on the timeline
    (index scan) but are not full-text addressable, documented here."""
    index_df = index_df.where(F.col("key").isNotNull())
    tokens = None
    for f in fields:
        t = _field_tokens(index_df, f, mode, stem)
        tokens = t if tokens is None else tokens.unionByName(t)

    postings = tokens.groupBy("term", "type", "key", "field").agg(
        F.count(F.lit(1)).alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )
    if persist:
        postings = postings.persist()
    doc_lengths = postings.groupBy("type", "key").agg(
        F.sum("tf").cast("long").alias("dl")
    )
    return postings, doc_lengths


def build_fts_index(
    index_df: DataFrame,
    fields=FTS_FIELDS,
    mode: str = "portable",
    stem: bool = False,
    persist: bool = True,
) -> FtsIndex:
    """The whole inverted-index build, with corpus scalars."""
    postings, doc_lengths = postings_and_lengths(
        index_df, fields, mode, stem, persist=persist
    )
    if persist:
        doc_lengths = doc_lengths.persist()

    # corpus scalars: N counts every KEYED row of search_index
    # (token-less rows have dl = 0 and still dilute avgdl, matching
    # FTS5; NULL-key rows are outside the FTS doc universe — see
    # postings_and_lengths)
    n_docs = index_df.where(F.col("key").isNotNull()).count()
    total_tokens = doc_lengths.agg(F.sum("dl")).collect()[0][0] or 0
    avgdl = (total_tokens / n_docs) if n_docs else 0.0

    return FtsIndex(
        postings=postings,
        doc_lengths=doc_lengths,
        n_docs=n_docs,
        avgdl=avgdl,
        mode=mode,
        stem=stem,
        fields=tuple(fields),
    )


def stem_fts_index(fts: FtsIndex, persist: bool = True) -> FtsIndex:
    """Derive the Porter-stemmed index FROM an already-built unstemmed
    index, without re-tokenizing the corpus.

    Stemming is per-token, so doc lengths, n_docs and avgdl are
    invariant; only the term dictionary changes.  The stem UDF therefore
    runs over ``distinct(term)`` — the vocabulary, orders of magnitude
    smaller than the token stream — and a join maps each posting to its
    stemmed term before re-aggregating tf/positions.  Position lists of
    distinct terms within one (doc, field) are disjoint, so
    flatten+sort is exact.

    At 100 TB this converts a second full corpus tokenize (the dominant
    index-build cost) into vocab-sized work + one co-partitioned join.
    """
    from dogsheep_beta_spark.functions.tokenizer import porter_stem

    @F.pandas_udf("string")
    def stem_term(batch):
        return batch.map(porter_stem)

    vocab = fts.postings.select("term").distinct()
    stem_map = vocab.withColumn("stem", stem_term(F.col("term")))
    postings = (
        fts.postings.join(stem_map, "term")
        .groupBy(F.col("stem").alias("term"), "type", "key", "field")
        .agg(
            F.sum("tf").cast("long").alias("tf"),
            F.sort_array(F.flatten(F.collect_list("positions"))).alias(
                "positions"
            ),
        )
    )
    if persist:
        postings = postings.persist()
    return FtsIndex(
        postings=postings,
        doc_lengths=fts.doc_lengths,
        n_docs=fts.n_docs,
        avgdl=fts.avgdl,
        mode=fts.mode,
        stem=True,
        fields=fts.fields,
    )


def write_fts_index(
    fts: FtsIndex,
    path: str,
    term_buckets: int = 0,
    term_partitions: int = 0,
    term_scheme: str = "hash",
) -> None:
    """Persist postings/doc_lengths as Parquet, plus a meta.json so
    ``read_fts_index`` restores a fully-usable FtsIndex.

    Three at-rest layouts (SURVEY §7.5):
    - ``term_buckets`` > 0: repartition+sort by term so row-group
      min/max stats skip whole row groups within each file;
    - ``term_partitions`` > 0 (scheme "hash"): hive-partition by
      ``term_pfx`` (md5-bucket of the term) so an exact-term MATCH
      lookup scans only its bucket DIRECTORIES (PartitionFilters — the
      same pruning the IVF cell layout gets; the MATCH compiler adds
      the bucket predicate automatically via ``_scoped_postings``).
      Balanced, but a ``prefix*`` query is unboundable under hashing
      and scans every bucket;
    - ``term_scheme="prefix"``: hive-partition by the LEXICOGRAPHIC
      key ``term_pfx = "p" + term[:2]`` so exact terms AND ``prefix*``
      queries both carry PartitionFilters (an equality for prefixes of
      length ≥ 2, a StartsWith for single-char prefixes — both prune
      directories).  Files are additionally sorted by term within each
      partition, so row-group stats narrow the in-directory scan.
      Partition count follows the corpus's leading-bigram dictionary
      (≲ #alphabet² dirs); skewed bigrams make bigger directories, not
      broken pruning.
    """
    import json
    import os

    p = fts.postings
    writer_partition = None
    if term_scheme == "prefix":
        p = (
            p.withColumn("term_pfx", F.concat(F.lit("p"), F.substring("term", 1, 2)))
            .repartition("term_pfx")
            .sortWithinPartitions("term")
        )
        writer_partition = "term_pfx"
        term_partitions = 0
    elif term_partitions:
        p = p.withColumn(
            "term_pfx",
            (
                F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long")
                % term_partitions
            ).cast("int"),
        )
        writer_partition = "term_pfx"
    elif term_buckets:
        p = p.repartition(term_buckets, "term").sortWithinPartitions("term")
    w = p.write.mode("overwrite")
    if writer_partition:
        w = w.partitionBy(writer_partition)
    w.parquet(f"{path}/postings")
    fts.doc_lengths.write.mode("overwrite").parquet(f"{path}/doc_lengths")
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(
            {
                "n_docs": fts.n_docs,
                "avgdl": fts.avgdl,
                "mode": fts.mode,
                "stem": fts.stem,
                "fields": list(fts.fields),
                "term_partitions": term_partitions,
                "term_scheme": term_scheme,
            },
            fh,
        )


def read_fts_index(spark: SparkSession, path: str) -> FtsIndex:
    """Restore a persisted index: postings (partition-pruned lookups
    when the layout was written with ``term_partitions``), doc_lengths,
    and the corpus scalars from meta.json — no corpus scan needed."""
    import json
    import os

    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    return FtsIndex(
        postings=spark.read.parquet(f"{path}/postings"),
        doc_lengths=spark.read.parquet(f"{path}/doc_lengths"),
        n_docs=meta["n_docs"],
        avgdl=meta["avgdl"],
        mode=meta["mode"],
        stem=meta["stem"],
        fields=tuple(meta["fields"]),
        term_partitions=meta["term_partitions"],
        term_scheme=meta.get("term_scheme", "hash"),
    )
