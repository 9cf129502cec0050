"""Multimodal (image/audio/video) column handling — north-star extension.

Design: media is an opaque ``binary`` column plus typed metadata
(SURVEY task brief).  The Spark-side plumbing — schema, partitioning,
Arrow batch shape, UDF signatures — is real and tested.  Decoding is
real for PNG images and PCM WAV audio via the pure-stdlib codecs in
``functions/codecs.py`` (this container has no PIL/ffmpeg);
``extract_features`` sniffs each row's magic bytes and routes to the
matching decoder, falling back to the deterministic hash features for
bytes no codec claims.  Video (round 5): AVI containers DEMUX for real
(RIFF chunk walk, functions/codecs.py) — ``frame_sample`` emits actual
frame bytes, and uncompressed ('DIB ') streams get real frame-pixel
features; only COMPRESSED video decode still raises through
``decode_stub`` (no stdlib route to H.264 and friends).

At 100 TB: media bytes dominate — keep them in their own column chunk
(parquet does), never shuffle them (all transforms below are map-only
``mapInPandas`` passes), and carry only features/metadata into joins.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def decode_stub(content: bytes, kind: str):
    """Placeholder for codecs with no stdlib/pure-Python implementation
    here (e.g. H.264/VP9 video, MP3/AAC audio).

    Raises so nobody mistakes the fake features for real decoding.
    PNG/WAV/uncompressed-AVI decode for real via functions/codecs.py,
    and MJPEG-in-AVI frames decode for real via functions/jpeg.py +
    ``mjpeg_frame_table`` (r9); only codecs beyond those land here and
    need external libraries wired in."""
    raise NotImplementedError(
        f"media decode for kind={kind!r} requires codec libraries not "
        "present in this environment; PNG/WAV/uncompressed-AVI decode "
        "via functions/codecs.py, MJPEG via functions/jpeg.py — other "
        "compressed video/audio codecs need ffmpeg wired here"
    )


def _fake_features(content: bytes, n: int = 8) -> list[float]:
    """Deterministic stand-in features: byte-histogram moments.  Real
    and stable enough to exercise partitioning/joins downstream."""
    if not content:
        return [0.0] * n
    import hashlib

    h = hashlib.md5(content).digest()
    return [b / 255.0 for b in h[:n]]


def media_metadata(media: DataFrame) -> DataFrame:
    """(media_id, kind, n_bytes, digest) — byte count + content hash as
    codegen column expressions.  These are JVM builtins; routing them
    through Python would serialize every content byte over Arrow for
    nothing (the round-1 declared query did exactly that — 141× DuckDB).
    Python/Arrow is reserved for work that genuinely needs a codec
    (``extract_features``)."""
    return media.select(
        "media_id",
        "kind",
        F.coalesce(F.length("content"), F.lit(0)).cast("long").alias("n_bytes"),
        F.md5("content").alias("digest"),
    )


def _row_features(content: bytes) -> list[float]:
    """Route one row's bytes to the matching REAL decoder by magic
    bytes (PNG → image decode + stats, RIFF/WAVE → PCM decode + stats);
    unrecognized bytes fall back to the deterministic hash features so
    mixed corpora keep flowing.  A corrupt file that CLAIMS a supported
    magic raises — silent fake features for a broken PNG would poison
    the feature column."""
    from dogsheep_beta_spark.functions.codecs import (
        audio_features,
        avi_metadata,
        image_features,
        sniff_kind,
        video_features,
    )

    sniffed = sniff_kind(content)
    if sniffed == "image":
        return image_features(content)
    if sniffed == "audio":
        return audio_features(content)
    if sniffed == "video":
        comp = avi_metadata(content).get("compression")
        if comp == "MJPG":  # real pure-Python decode path (r9)
            from dogsheep_beta_spark.functions.codecs import avi_frames
            from dogsheep_beta_spark.functions.jpeg import decode_jpeg_gray

            import numpy as np

            pix = [
                np.frombuffer(decode_jpeg_gray(f)[2], np.uint8)
                for f in avi_frames(content)
            ]
            if not pix:
                return [0.0] * 8
            cat = np.concatenate(pix).astype(np.float64) / 255.0
            per_frame = [float(p.mean()) / 255.0 for p in pix]
            return [
                float(len(pix)),
                float(cat.size),
                float(cat.mean()),
                float(cat.std()),
                float(cat.min()),
                float(cat.max()),
                float(min(per_frame)),
                float(max(per_frame)),
            ]
        if comp:
            decode_stub(content, "video")  # raises: no pure-Python codec
        return video_features(content)
    return _fake_features(content)


def extract_features(media: DataFrame) -> DataFrame:
    """Map-only Arrow-batched feature extraction over the media table.

    Real codecs (stdlib PNG/WAV — functions/codecs.py) run per row for
    recognized containers; everything else gets the deterministic
    fallback features.  ``mapInPandas`` keeps the binary column inside
    one pass — no shuffle of content bytes; output carries only small
    features.  Column pruning keeps the Arrow transfer to (media_id,
    kind, content); JVM-expressible metadata lives in
    ``media_metadata``.  Arrow batch sizing is governed by the
    session's ``spark.sql.execution.arrow.maxRecordsPerBatch`` —
    lower it for corpora of very large blobs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": pdf["content"].map(
                        lambda c: _row_features(c or b"")
                    ),
                }
            )

    return media.select("media_id", "kind", "content").mapInPandas(
        run, FEATURE_SCHEMA
    )


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents table (UTF-8 bytes as
    the opaque content) — deterministic fixture for pipeline tests."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for NON-container bytes: emits
    (media_id, frame_no) rows with stubbed frame bytes.  Shows the
    explode-shape (one row per sampled frame) without a demuxable
    container; real AVI content goes through ``frame_sample``."""
    n_frames = (F.length(F.col("content")) / F.lit(every_n)).cast("int")
    # zero frames -> NO rows: explode() drops the NULL array, so NULL,
    # empty, or shorter-than-every_n content cannot emit a phantom
    # frame_no=0 row (sequence(0, 0) would)
    return media.select(
        "media_id",
        F.explode(
            F.when(n_frames >= 1, F.sequence(F.lit(0), n_frames - 1))
        ).alias("frame_no"),
    ).withColumn("frame_content", F.lit(None).cast("binary"))


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("frame_content", T.BinaryType(), True),
    ]
)


def frame_sample(media: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL video frame sampling (round 5): demux each AVI row's RIFF
    container inside one Arrow-batched map pass and emit every
    ``every_n``-th frame's actual payload bytes — the frame-level
    training-data primitive (sample → caption/filter/embed downstream).

    Map-only like every media transform here: content bytes never
    shuffle; the fan-out is the per-row frame count.  Non-AVI rows are
    skipped (the stub shape serves them); demuxing needs no codec, so
    this works for compressed streams too — only frame DECODE is
    codec-bound."""
    from dogsheep_beta_spark.functions.codecs import avi_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "n_bytes": [], "frame_content": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content or b"")
                if raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
                    continue
                for i, fb in enumerate(avi_frames(raw)):
                    if i % every_n:
                        continue
                    out["media_id"].append(mid)
                    out["frame_no"].append(i)
                    out["n_bytes"].append(len(fb))
                    out["frame_content"].append(fb)
            pdf_out = pd.DataFrame(out)
            # explicit dtypes so an all-skipped (empty) batch still
            # matches the Arrow schema
            for c, dt in (
                ("media_id", "int64"), ("frame_no", "int32"), ("n_bytes", "int64"),
            ):
                pdf_out[c] = pdf_out[c].astype(dt)
            yield pdf_out

    return media.select("media_id", "content").mapInPandas(run, FRAME_SCHEMA)


MJPEG_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("px_sum", T.LongType(), False),
        T.StructField("pixels", T.BinaryType(), True),
    ]
)


def mjpeg_frame_table(media: DataFrame) -> DataFrame:
    """REAL compressed-video frame DECODE (r9, closing the last media
    stub): demux each MJPEG-in-AVI row and run every '00dc' payload
    through the pure-Python baseline JPEG decoder
    (functions/jpeg.decode_jpeg_gray) — one row per frame with the
    decoded dimensions, the exact integer pixel sum, and the raw
    row-major pixel bytes for downstream feature extraction.

    Same map-only contract as ``frame_sample``: media bytes never
    shuffle, the fan-out is the per-row frame count, and rows that are
    not MJPEG AVIs (wrong RIFF, non-MJPG fourcc) are skipped rather
    than guessed at.  Decode dispatches through
    ``decode_jpeg_gray_fast`` (r10): a per-process capability probe
    adopts PIL/libjpeg ONLY if it reproduces the pure-Python oracle
    decoder byte-for-byte on a self-encoded probe image, else falls
    back — same contract either way, so the strict-hash oracle pins
    both paths.  A frame that IS tagged MJPG but fails to parse
    raises — a corrupt frame in a declared-MJPEG stream is data loss,
    not a row to drop silently.  Codecs beyond baseline grayscale JPEG
    still route to ``decode_stub``."""
    from dogsheep_beta_spark.functions.codecs import avi_frames, avi_metadata
    from dogsheep_beta_spark.functions.jpeg import decode_jpeg_gray_fast

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "frame_no": [], "width": [],
                "height": [], "px_sum": [], "pixels": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content or b"")
                if raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
                    continue
                if avi_metadata(raw).get("compression") != "MJPG":
                    continue
                for i, fb in enumerate(avi_frames(raw)):
                    w, h, px = decode_jpeg_gray_fast(fb)
                    out["media_id"].append(mid)
                    out["frame_no"].append(i)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["px_sum"].append(sum(px))
                    out["pixels"].append(px)
            pdf_out = pd.DataFrame(out)
            for c, dt in (
                ("media_id", "int64"), ("frame_no", "int32"),
                ("width", "int32"), ("height", "int32"),
                ("px_sum", "int64"),
            ):
                pdf_out[c] = pdf_out[c].astype(dt)
            yield pdf_out

    return media.select("media_id", "content").mapInPandas(
        run, MJPEG_FRAME_SCHEMA
    )
