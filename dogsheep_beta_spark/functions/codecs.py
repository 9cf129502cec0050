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

Video stays stubbed (``multimodal.decode_stub``) — there is no
stdlib-only route to a real video codec.

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
    """'image' / 'audio' when the magic bytes identify a supported
    container, else None."""
    if data[:8] == PNG_SIG:
        return "image"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "audio"
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
        samples = array.array("b", bytes(b - 128 for b in frames))
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
