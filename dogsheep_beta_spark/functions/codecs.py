"""Pure-stdlib media codecs — the REAL decode path for the multimodal
column suite (SURVEY task brief: image/audio as opaque binary columns
with typed decode/feature-extract).

The container has no PIL/ffmpeg/soundfile, so rather than stubbing
forever this module implements the two formats that need nothing
beyond the standard library:

- PNG: chunk parse + zlib inflate + per-scanline unfilter (all five
  RFC 2083 filter types: None/Sub/Up/Average/Paeth), 8-bit depth,
  color types gray / RGB / palette / gray+alpha / RGBA, non-interlaced.
  A minimal encoder (filter 0) exists for fixtures and round-trips.
- WAV: PCM via the stdlib ``wave`` module (8/16-bit int samples).
- AVI: RIFF container demux (round 5) — header metadata, frame chunk
  extraction, and, for UNCOMPRESSED ('DIB ') streams, real frame-level
  pixel features (raw frame bytes ARE the pixels).  Compressed video
  codecs (H.264 etc.) still raise through ``multimodal.decode_stub`` —
  decoding those has no stdlib route.

These run INSIDE Arrow-batched ``mapInPandas`` workers
(multimodal.extract_features): per-row Python is the honest cost of a
codec — exactly the case the "UDFs are the slow path" rule carves out.
At scale the shape is unchanged: map-only pass, media bytes never
shuffle, only small feature vectors leave the stage.
"""

from __future__ import annotations

import io
import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color_type -> samples/px


def sniff_kind(data: bytes) -> str | None:
    """'image' / 'audio' / 'video' when the magic bytes identify a
    supported container, else None."""
    if data[:8] == PNG_SIG:
        return "image"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "audio"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "video"
    return None


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) — pixels row-major, unfiltered,
    palette expanded to RGB.  Raises ValueError on anything outside the
    supported profile (8-bit, non-interlaced)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = channels = None
    idat = bytearray()
    plte = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported bit depth {bit_depth}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            if comp or filt:
                raise ValueError("nonstandard compression/filter method")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            channels = _CHANNELS[color_type]
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT length does not match dimensions")
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _y in range(height):
        f = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if f == 1:  # Sub
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + left) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                up_left = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], up_left)) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown filter type {f}")
        out += line
        prev = line
    if color_type == 3:  # expand palette to RGB
        if plte is None:
            raise ValueError("palette image without PLTE")
        rgb = bytearray()
        for idx in out:
            rgb += plte[3 * idx : 3 * idx + 3]
        return width, height, 3, bytes(rgb)
    return width, height, channels, bytes(out)


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Minimal encoder (filter 0 scanlines) — fixtures + round-trips."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match dimensions")
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw += pixels[y * stride : (y + 1) * stride]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_wav(data: bytes) -> tuple[int, int, int, int, bytes]:
    """(n_channels, sample_rate, sample_width, n_frames, frames) via the
    stdlib ``wave`` reader (PCM only — wave raises on compressed)."""
    with wave_open(data) as w:
        return (
            w.getnchannels(),
            w.getframerate(),
            w.getsampwidth(),
            w.getnframes(),
            w.readframes(w.getnframes()),
        )


def wave_open(data: bytes):
    import wave

    return wave.open(io.BytesIO(data), "rb")


def encode_wav(
    samples: list[int], sample_rate: int = 8000, n_channels: int = 1
) -> bytes:
    """Minimal 16-bit PCM writer for fixtures."""
    import array
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(array.array("h", samples).tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# feature extraction — fixed 8-dim vectors per modality
# ---------------------------------------------------------------------------


def image_features(data: bytes) -> list[float]:
    """8 deterministic image features from a real decode: dimensions,
    channel count, luminance mean/std, first/last channel means, aspect
    ratio.  Small on purpose — the point is a REAL decode feeding a
    fixed-width feature column, not a model embedding."""
    width, height, channels, px = decode_png(data)
    n = len(px)
    if n == 0:
        return [float(width), float(height), float(channels), 0, 0, 0, 0, 0]
    total = sum(px)
    mean = total / n
    var = sum((b - mean) ** 2 for b in px) / n
    c0 = px[0::channels]
    cl = px[channels - 1 :: channels]
    return [
        float(width),
        float(height),
        float(channels),
        mean / 255.0,
        (var**0.5) / 255.0,
        (sum(c0) / len(c0)) / 255.0,
        (sum(cl) / len(cl)) / 255.0,
        width / height,
    ]


def audio_features(data: bytes) -> list[float]:
    """8 deterministic audio features from a real decode: channel
    count, rate, frame count, duration, normalized mean/RMS/peak,
    zero-crossing rate (16-bit PCM; 8-bit handled via offset)."""
    import array

    n_ch, rate, width, n_frames, frames = decode_wav(data)
    if width == 2:
        samples = array.array("h", frames)
        scale = 32768.0
    elif width == 1:
        # 8-bit PCM is UNSIGNED (0..255, silence = 128): recenter via
        # unsigned load then subtract — bytes(b - 128 …) rejected the
        # negative ints and crashed on any real 8-bit audio
        samples = array.array("h", (b - 128 for b in frames))
        scale = 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    n = len(samples)
    if n == 0:
        return [float(n_ch), float(rate), 0, 0, 0, 0, 0, 0]
    mean = sum(samples) / n
    rms = (sum(s * s for s in samples) / n) ** 0.5
    peak = max(abs(s) for s in samples)
    zc = sum(
        1 for i in range(1, n) if (samples[i - 1] < 0) != (samples[i] < 0)
    )
    return [
        float(n_ch),
        float(rate),
        float(n_frames),
        n_frames / rate if rate else 0.0,
        mean / scale,
        rms / scale,
        peak / scale,
        zc / n,
    ]


# ---------------------------------------------------------------------------
# AVI (RIFF) container — pure-struct demuxer + minimal writer
# ---------------------------------------------------------------------------
#
# Round 5 closes the "video is a stub" gap at the CONTAINER level: an
# AVI file is a plain RIFF chunk tree ('hdrl' headers + 'movi' frame
# chunks), fully parseable with the standard library.  For UNCOMPRESSED
# streams (biCompression == 0, 'DIB ' raw frames) the demuxed frame
# bytes ARE the pixels, so frame sampling and frame-level features are
# genuinely real; compressed codecs (H.264 etc.) still raise through
# ``multimodal.decode_stub`` — decoding those has no stdlib route.

AVI_MAGIC = (b"RIFF", b"AVI ")


def _riff_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size); chunks pad to even."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def avi_metadata(data: bytes) -> dict:
    """Header fields of an AVI: width, height, fps (micros-per-frame
    rounded), n_frames, compression fourcc ('' = uncompressed DIB).
    Raises ValueError on a non-AVI RIFF or truncated header."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI RIFF")
    meta: dict = {}
    for fourcc, p, size in _riff_chunks(data, 12, len(data)):
        if fourcc != b"LIST":
            continue
        list_type = data[p : p + 4]
        if list_type == b"hdrl":
            for f2, p2, s2 in _riff_chunks(data, p + 4, p + size):
                if f2 == b"avih" and s2 >= 40:
                    us_pf, _mbs, _pad, _flags, total, _init, _streams, _sb, w, h = (
                        struct.unpack("<10I", data[p2 : p2 + 40])
                    )
                    meta.update(
                        width=w,
                        height=h,
                        n_frames=total,
                        fps=round(1_000_000 / us_pf, 3) if us_pf else 0.0,
                    )
                elif f2 == b"LIST" and data[p2 : p2 + 4] == b"strl":
                    # only the VIDEO stream's strf is a BITMAPINFOHEADER
                    # with a compression fourcc at offset 16 — an
                    # audio-first AVI's WAVEFORMAT strf would yield
                    # garbage; gate on the stream header's fccType
                    is_vids = False
                    for f3, p3, s3 in _riff_chunks(data, p2 + 4, p2 + s2):
                        if f3 == b"strh" and s3 >= 4:
                            is_vids = data[p3 : p3 + 4] == b"vids"
                        elif (
                            f3 == b"strf"
                            and s3 >= 40
                            and is_vids
                            and "compression" not in meta
                        ):
                            comp = struct.unpack("<I", data[p3 + 16 : p3 + 20])[0]
                            meta["compression"] = (
                                ""
                                if comp == 0
                                else struct.pack("<I", comp).decode(
                                    "ascii", "replace"
                                ).strip()
                            )
    if "n_frames" not in meta:
        raise ValueError("AVI without avih header")
    meta.setdefault("compression", "")
    return meta


def avi_frames(data: bytes) -> list[bytes]:
    """Video frame payloads, in stream order, from every 'movi' list
    ('##db' raw / '##dc' compressed chunks of any stream)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI RIFF")
    frames: list[bytes] = []
    for fourcc, p, size in _riff_chunks(data, 12, len(data)):
        if fourcc == b"LIST" and data[p : p + 4] == b"movi":
            for f2, p2, s2 in _riff_chunks(data, p + 4, p + size):
                if f2[2:4] in (b"db", b"dc"):
                    frames.append(data[p2 : p2 + s2])
    return frames


def encode_avi(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
    compression: str = "DIB ",
) -> bytes:
    """Minimal AVI around the given frame payloads — the writer twin
    ``avi_metadata``/``avi_frames`` round-trip against, and the fixture
    generator for the declared queries.  ``compression``: the stream
    fourcc — 'DIB ' (uncompressed, '00db' chunks, the default) or a
    codec fourcc like 'MJPG' (r9: compressed '00dc' chunks whose
    payloads are whole JPEG files, the Motion-JPEG convention)."""

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(list_type: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", list_type + payload)

    us_pf = 1_000_000 // max(fps, 1)
    buf_sz = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I", us_pf, buf_sz * max(fps, 1), 0, 0x10, len(frames), 0, 1,
        buf_sz, width, height, 0, 0, 0, 0,
    )
    fcc = compression.encode("ascii")
    if len(fcc) != 4:
        raise ValueError("compression fourcc must be exactly 4 chars")
    uncompressed = compression == "DIB "
    strh = (
        b"vids" + fcc
        + struct.pack("<IHHI", 0, 0, 0, 0)  # flags, priority, language, initialFrames
        + struct.pack("<IIII", 1, max(fps, 1), 0, len(frames))  # scale, rate, start, length
        + struct.pack("<IiI", buf_sz, -1, 0)  # suggestedBuffer, quality, sampleSize
        + struct.pack("<4H", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24,
        0 if uncompressed else struct.unpack("<I", fcc)[0],
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    fid = b"00db" if uncompressed else b"00dc"
    movi = lst(b"movi", b"".join(chunk(fid, f) for f in frames))
    riff_payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def video_features(data: bytes, n: int = 8) -> list[float]:
    """Feature vector for an UNCOMPRESSED AVI: per-frame-sampled byte
    statistics over the raw pixel payloads (mean/std/min/max over the
    first/middle/last frames + frame count + fps) — real decoded
    content, since DIB frame bytes are the pixels.  Compressed AVIs
    raise (no stdlib codec)."""
    meta = avi_metadata(data)
    if meta.get("compression"):
        raise ValueError(
            f"compressed AVI ({meta['compression']}) needs a codec library"
        )
    frames = avi_frames(data)
    if not frames:
        return [0.0] * n
    picks = [frames[0], frames[len(frames) // 2], frames[-1]]
    stats: list[float] = []
    for fb in picks[:2]:
        if fb:
            m = sum(fb) / len(fb)
            var = sum((b - m) ** 2 for b in fb) / len(fb)
            stats += [round(m / 255.0, 6), round(var**0.5 / 255.0, 6)]
        else:
            stats += [0.0, 0.0]
    last = picks[2]
    stats += [
        round((min(last) if last else 0) / 255.0, 6),
        round((max(last) if last else 0) / 255.0, 6),
    ]
    stats += [float(len(frames)), float(meta["fps"])]
    return stats[:n]
