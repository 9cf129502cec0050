"""Pure-stdlib media codecs: PNG decode (all five filter types,
palette expansion) and PCM WAV decode, plus their integration into the
Arrow-batched feature extractor (multimodal.extract_features)."""

import struct
import zlib

import pytest

from dogsheep_beta_spark.functions.codecs import (
    PNG_SIG,
    audio_features,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    image_features,
    sniff_kind,
)


def test_png_roundtrip_gray_rgb_rgba():
    for channels in (1, 2, 3, 4):
        w, h = 3, 2
        px = bytes(range(w * h * channels))
        data = encode_png(w, h, channels, px)
        assert sniff_kind(data) == "image"
        gw, gh, gch, gpx = decode_png(data)
        assert (gw, gh, gch, gpx) == (w, h, channels, px)


def _png_with_filters(width, height, channels, pixels, filters):
    """Build a PNG whose scanlines use the GIVEN filter types, applying
    each filter's forward transform by hand — exercises the decoder's
    unfilter paths (the library encoder only emits filter 0)."""

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    stride = width * channels
    raw = bytearray()
    prev = bytes(stride)
    for y, f in zip(range(height), filters):
        line = pixels[y * stride : (y + 1) * stride]
        raw.append(f)
        for i in range(stride):
            left = line[i - channels] if i >= channels else 0
            up = prev[i]
            up_left = prev[i - channels] if i >= channels else 0
            if f == 0:
                v = line[i]
            elif f == 1:
                v = line[i] - left
            elif f == 2:
                v = line[i] - up
            elif f == 3:
                v = line[i] - (left + up) // 2
            else:
                v = line[i] - paeth(left, up, up_left)
            raw.append(v & 0xFF)
        prev = line

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_all_filter_types_unfilter_correctly():
    w, h, ch = 4, 5, 3
    px = bytes((i * 37 + 11) % 256 for i in range(w * h * ch))
    data = _png_with_filters(w, h, ch, px, filters=[0, 1, 2, 3, 4])
    assert decode_png(data) == (w, h, ch, px)


def test_png_palette_expands_to_rgb():
    # 2x2 palette image: indices 0..3 into a 4-color palette
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    raw = bytes([0, 0, 1, 0, 2, 3])  # two scanlines, filter 0

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    data = (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, ch, px = decode_png(data)
    assert (w, h, ch) == (2, 2, 3)
    assert px == bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # interlaced flag set
    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IEND", b""))


def test_image_features_known_values():
    # 1x1 gray pixel of value 255 -> mean 1.0, std 0, aspect 1
    data = encode_png(1, 1, 1, bytes([255]))
    f = image_features(data)
    assert f == [1.0, 1.0, 1.0, 1.0, 0.0, 1.0, 1.0, 1.0]
    # 2x1 RGB: (0,0,0) and (255,255,255) -> mean 0.5
    data = encode_png(2, 1, 3, bytes([0, 0, 0, 255, 255, 255]))
    f = image_features(data)
    assert f[0:3] == [2.0, 1.0, 3.0]
    assert f[3] == pytest.approx(0.5)
    assert f[7] == 2.0  # aspect


def test_wav_roundtrip_and_features():
    samples = [0, 16384, -16384, 32767, -32768, 0, 0, 0]
    data = encode_wav(samples, sample_rate=8000)
    assert sniff_kind(data) == "audio"
    n_ch, rate, width, n_frames, frames = decode_wav(data)
    assert (n_ch, rate, width, n_frames) == (1, 8000, 2, len(samples))
    f = audio_features(data)
    assert f[0] == 1.0 and f[1] == 8000.0 and f[2] == len(samples)
    assert f[3] == pytest.approx(len(samples) / 8000)
    assert f[6] == pytest.approx(32768 / 32768.0)  # peak
    assert 0 < f[7] < 1  # zero crossings present


def test_extract_features_routes_real_codecs(spark):
    """End-to-end through the Arrow mapInPandas pass: a real PNG row
    and a real WAV row decode for REAL (recognizable dimensional
    features), while unrecognized bytes keep the deterministic hash
    fallback."""
    from dogsheep_beta_spark.operators.multimodal import (
        _fake_features,
        extract_features,
    )

    png = encode_png(3, 2, 3, bytes(range(18)))
    wav = encode_wav([100, -100, 200, -200], sample_rate=4000)
    blob = b"just some text bytes"
    media = spark.createDataFrame(
        [
            (1, "image", png, "image/png", None),
            (2, "audio", wav, "audio/wav", None),
            (3, "image", blob, "application/octet-stream", None),
        ],
        "media_id long, kind string, content binary, mime string, "
        "meta map<string,string>",
    )
    got = {
        r["media_id"]: r["features"]
        for r in extract_features(media).collect()
    }
    assert got[1] == image_features(png)
    assert got[1][0:3] == [3.0, 2.0, 3.0]  # real width/height/channels
    assert got[2] == audio_features(wav)
    assert got[2][1] == 4000.0  # real sample rate
    assert got[3] == _fake_features(blob)


def test_extract_features_corrupt_png_raises(spark):
    """Bytes that CLAIM the PNG magic but are corrupt must fail the
    job, not silently degrade to fake features."""
    from dogsheep_beta_spark.operators.multimodal import extract_features

    media = spark.createDataFrame(
        [(1, "image", PNG_SIG + b"garbage", "image/png", None)],
        "media_id long, kind string, content binary, mime string, "
        "meta map<string,string>",
    )
    with pytest.raises(Exception):
        extract_features(media).collect()


def test_avi_roundtrip_metadata_frames():
    from dogsheep_beta_spark.functions.codecs import (
        avi_frames,
        avi_metadata,
        encode_avi,
        sniff_kind,
        video_features,
    )

    frames = [bytes([(7 * i + j) % 200 for j in range(24)]) for i in range(5)]
    avi = encode_avi(frames, width=4, height=2, fps=25)
    assert sniff_kind(avi) == "video"
    meta = avi_metadata(avi)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (4, 2, 5)
    assert meta["fps"] == 25.0 and meta["compression"] == ""
    assert avi_frames(avi) == frames  # byte-exact demux
    feats = video_features(avi)
    assert len(feats) == 8 and feats[6] == 5.0 and feats[7] == 25.0


def test_avi_compressed_routes_to_stub():
    import pytest

    from dogsheep_beta_spark.functions.codecs import encode_avi
    from dogsheep_beta_spark.operators.multimodal import _row_features

    avi = bytearray(encode_avi([b"\x01" * 24], 4, 2))
    # flip biCompression in the strf header to a fake codec fourcc
    idx = bytes(avi).index(b"strf") + 8 + 16
    avi[idx : idx + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="compressed video"):
        _row_features(bytes(avi))


def test_frame_sample_real_demux(spark):
    from dogsheep_beta_spark.functions.codecs import encode_avi
    from dogsheep_beta_spark.operators.multimodal import frame_sample

    rows = [
        (1, encode_avi([b"\x0a" * 24, b"\x0b" * 24, b"\x0c" * 24], 4, 2)),
        (2, b"not a container at all"),
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        (r["media_id"], r["frame_no"]): bytes(r["frame_content"])
        for r in frame_sample(media, every_n=2).collect()
    }
    # every 2nd frame of the AVI row; the non-container row is skipped
    assert set(got) == {(1, 0), (1, 2)}
    assert got[(1, 0)] == b"\x0a" * 24 and got[(1, 2)] == b"\x0c" * 24


def test_wav_8bit_features():
    """8-bit PCM is UNSIGNED (silence = 128) — regression for the
    bytes(b - 128 ...) crash on any byte < 128 (round 6 review)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([128, 255, 0, 128]))
    data = buf.getvalue()
    n_ch, rate, width, n_frames, _ = decode_wav(data)
    assert (n_ch, rate, width, n_frames) == (1, 8000, 1, 4)
    f = audio_features(data)
    assert f[2] == 4.0
    assert f[6] == pytest.approx(128 / 128.0)  # peak |0 - 128| = 128
    assert f[4] == pytest.approx((0 + 127 - 128 + 0) / 4 / 128.0)  # mean


def test_avi_audio_first_stream_not_mistaken_for_video():
    """compression must come from the 'vids' stream's strf — an
    audio-first AVI whose WAVEFORMAT strf is >= 40 bytes previously
    yielded a garbage compression fourcc (round 6 review)."""
    from dogsheep_beta_spark.functions.codecs import avi_metadata, encode_avi

    def chunk(fourcc, payload):
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    avi = encode_avi([b"\x05" * 24], width=4, height=2, fps=10)
    # an 'auds' strl whose 40-byte strf has garbage at offset 16
    audio_strf = bytes(16) + b"MP3!" + bytes(20)
    audio_strl = chunk(
        b"LIST",
        b"strl" + chunk(b"strh", b"auds" + bytes(52)) + chunk(b"strf", audio_strf),
    )
    # splice the audio strl in FRONT of the video strl inside hdrl
    h = avi.index(b"hdrl")
    vstrl = avi.index(b"LIST", h)
    patched = bytearray(avi[:vstrl] + audio_strl + avi[vstrl:])
    # grow the hdrl LIST and RIFF sizes by the inserted bytes
    grow = len(audio_strl)
    for at in (4, h - 8 + 4):
        (sz,) = struct.unpack("<I", patched[at : at + 4])
        patched[at : at + 4] = struct.pack("<I", sz + grow)
    meta = avi_metadata(bytes(patched))
    assert meta["compression"] == ""  # from the vids stream, not auds
    assert (meta["width"], meta["height"], meta["n_frames"]) == (4, 2, 1)


def test_jpeg_constant_roundtrip_exact():
    """Flat-8 quant + constant frame => decode∘encode is the IDENTITY
    (DC = 8·(v−128) quantizes by /8 exactly, AC all zero) — the
    arithmetic-oracle contract of media_mjpeg_frames."""
    from dogsheep_beta_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    for v in (0, 1, 64, 127, 128, 200, 255):
        img = bytes([v]) * (16 * 8)
        w, h, px = decode_jpeg_gray(encode_jpeg_gray(16, 8, img))
        assert (w, h) == (16, 8)
        assert px == img, v


def test_jpeg_lossy_roundtrip_bounded_error():
    """decode(encode(img)) must approximate the ORIGINAL within the
    quantization error budget — a matched encoder/decoder bug pair
    (e.g. both using a wrong DCT) cannot pass this, because the bound
    is against the input, not the codec's own inverse."""
    import numpy as np

    from dogsheep_beta_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.RandomState(11)
    for wdim, hdim in ((40, 24), (31, 17), (8, 8), (9, 9)):
        img = rng.randint(0, 256, (hdim, wdim)).astype(np.uint8)
        w, h, px = decode_jpeg_gray(encode_jpeg_gray(wdim, hdim, img.tobytes()))
        assert (w, h) == (wdim, hdim)
        dec = np.frombuffer(px, np.uint8).reshape(hdim, wdim).astype(int)
        # flat-8 table: worst-case IDCT error Σ|q_err| ≤ 64·4/8... keep
        # a generous but bug-catching bound (a wrong DCT is off by >100)
        assert np.abs(dec - img.astype(int)).max() <= 40


def test_jpeg_dc_prediction_across_blocks():
    """Multi-block images exercise the DC difference chain: a step
    image (two constant halves) must decode to exactly those halves
    under the flat table (each block is constant)."""
    from dogsheep_beta_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    img = bytes([30]) * 8 * 8  # will interleave per row below
    rows = (bytes([30]) * 8 + bytes([200]) * 8) * 8  # 16x8: left 30, right 200
    w, h, px = decode_jpeg_gray(encode_jpeg_gray(16, 8, rows))
    assert px == rows
    assert img  # silence lint


def test_jpeg_rejects_out_of_scope():
    import pytest

    from dogsheep_beta_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"not a jpeg")
    with pytest.raises(ValueError, match="pixels length"):
        encode_jpeg_gray(8, 8, b"\x00" * 3)
    with pytest.raises(ValueError, match="quant"):
        encode_jpeg_gray(8, 8, b"\x00" * 64, quant=[0] * 64)
    # truncated entropy stream raises, never returns garbage
    good = encode_jpeg_gray(16, 16, bytes(range(256)))
    with pytest.raises(ValueError):
        decode_jpeg_gray(good[: len(good) // 2])


def test_avi_mjpeg_fourcc_roundtrip():
    """encode_avi(compression='MJPG') writes '00dc' chunks + the MJPG
    strf fourcc; avi_metadata/avi_frames read both back."""
    from dogsheep_beta_spark.functions.codecs import (
        avi_frames,
        avi_metadata,
        encode_avi,
    )
    from dogsheep_beta_spark.functions.jpeg import encode_jpeg_gray

    frames = [encode_jpeg_gray(16, 8, bytes([v]) * 128) for v in (9, 77)]
    avi = encode_avi(frames, 16, 8, fps=5, compression="MJPG")
    meta = avi_metadata(avi)
    assert meta["compression"] == "MJPG"
    assert meta["n_frames"] == 2 and meta["width"] == 16
    assert avi_frames(avi) == frames
    assert b"00dc" in avi and b"00db" not in avi


def test_mjpeg_frame_table_decodes(spark):
    """The mjpeg_frame_table operator: demux + REAL baseline-JPEG
    decode per frame; non-MJPEG rows are skipped; a corrupt frame in a
    declared-MJPEG stream raises loudly."""
    import pytest

    from dogsheep_beta_spark.functions.codecs import encode_avi
    from dogsheep_beta_spark.functions.jpeg import encode_jpeg_gray
    from dogsheep_beta_spark.operators.multimodal import mjpeg_frame_table

    good = encode_avi(
        [encode_jpeg_gray(16, 8, bytes([v]) * 128) for v in (5, 130)],
        16, 8, compression="MJPG",
    )
    plain = encode_avi([b"\x07" * 24], 4, 2)  # uncompressed: skipped
    media = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(plain)), (3, None)],
        "media_id long, content binary",
    )
    rows = {
        (r["media_id"], r["frame_no"]): r
        for r in mjpeg_frame_table(media).collect()
    }
    assert set(rows) == {(1, 0), (1, 1)}
    assert rows[(1, 0)]["px_sum"] == 128 * 5
    assert rows[(1, 1)]["px_sum"] == 128 * 130
    assert bytes(rows[(1, 0)]["pixels"]) == bytes([5]) * 128
    assert (rows[(1, 0)]["width"], rows[(1, 0)]["height"]) == (16, 8)

    corrupt = encode_avi([b"\xff\xd8 garbage"], 16, 8, compression="MJPG")
    bad = spark.createDataFrame(
        [(9, bytearray(corrupt))], "media_id long, content binary"
    )
    with pytest.raises(Exception, match="JPEG|marker|Huffman"):
        mjpeg_frame_table(bad).collect()


def test_extract_features_mjpeg_real_decode(spark):
    """_row_features routes MJPG AVIs through the real decoder now
    (r9): features computed from DECODED pixels, exact for constant
    frames; other compressed fourccs still raise the honest stub."""
    from dogsheep_beta_spark.functions.codecs import encode_avi
    from dogsheep_beta_spark.functions.jpeg import encode_jpeg_gray
    from dogsheep_beta_spark.operators.multimodal import _row_features

    avi = encode_avi(
        [encode_jpeg_gray(16, 8, bytes([100]) * 128)],
        16, 8, compression="MJPG",
    )
    f = _row_features(avi)
    assert f[0] == 1.0 and f[1] == 128.0          # frames, pixels
    assert abs(f[2] - 100.0 / 255.0) < 1e-12      # mean of constant
    assert f[3] < 1e-9                            # std of constant


def test_jpeg_fast_dispatch_falls_back_without_native():
    """decode_jpeg_gray_fast: with no PIL in this environment the
    probe returns None and dispatch is the pure-Python oracle path —
    byte-identical output."""
    import numpy as np

    from dogsheep_beta_spark.functions import jpeg

    jpeg._NATIVE_DECODER = False  # force a fresh probe
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=16 * 8, dtype=np.uint8).tobytes()
    enc = jpeg.encode_jpeg_gray(16, 8, img)
    assert jpeg.decode_jpeg_gray_fast(enc) == jpeg.decode_jpeg_gray(enc)


def test_jpeg_native_probe_rejects_inexact_decoder(monkeypatch):
    """The capability probe must REJECT a native decoder that imports
    fine but is not byte-exact against the pure oracle (the SIMD-
    rounding hazard), and ADOPT one that is — verified with injected
    fake PIL modules."""
    import io
    import sys
    import types

    import numpy as np

    from dogsheep_beta_spark.functions import jpeg

    def fake_pil(decode_fn):
        """A minimal PIL.Image.open returning an object with the bits
        the probe touches, backed by decode_fn."""
        mod = types.ModuleType("PIL")
        image_mod = types.ModuleType("PIL.Image")

        class _Im:
            def __init__(self, data):
                w, h, px = decode_fn(bytes(data))
                self.mode = "L"
                self.size = (w, h)
                self._px = px

            def tobytes(self):
                return self._px

        image_mod.open = lambda fh: _Im(fh.read())
        mod.Image = image_mod
        return {"PIL": mod, "PIL.Image": image_mod}

    def wrong(data):
        w, h, px = jpeg.decode_jpeg_gray(data)
        bad = bytearray(px)
        bad[0] ^= 1  # off-by-one-LSB: the classic inexact-IDCT delta
        return w, h, bytes(bad)

    for name, m in fake_pil(wrong).items():
        monkeypatch.setitem(sys.modules, name, m)
    jpeg._NATIVE_DECODER = False
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=16 * 8, dtype=np.uint8).tobytes()
    enc = jpeg.encode_jpeg_gray(16, 8, img)
    assert jpeg.decode_jpeg_gray_fast(enc) == jpeg.decode_jpeg_gray(enc)
    assert jpeg._NATIVE_DECODER is None  # probed and rejected

    # an exact decoder IS adopted
    calls = []

    def exact(data):
        calls.append(1)
        return jpeg.decode_jpeg_gray(data)

    for name, m in fake_pil(exact).items():
        monkeypatch.setitem(sys.modules, name, m)
    jpeg._NATIVE_DECODER = False
    assert jpeg.decode_jpeg_gray_fast(enc) == jpeg.decode_jpeg_gray(enc)
    assert jpeg._NATIVE_DECODER is not None  # probed and adopted
    assert calls  # the native path actually decoded

    jpeg._NATIVE_DECODER = False  # leave no probe state for other tests


def test_jpeg_native_dispatch_respects_pure_scope(monkeypatch):
    """Out-of-scope streams (e.g. progressive SOF2) must NEVER reach an
    adopted native decoder — even one that happily 'decodes' anything —
    so behavior is identical on hosts with and without the library:
    the pure path's ValueError, everywhere."""
    import sys
    import types

    import numpy as np
    import pytest

    from dogsheep_beta_spark.functions import jpeg

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=16 * 8, dtype=np.uint8).tobytes()
    good = jpeg.encode_jpeg_gray(16, 8, img)
    # flip baseline SOF0 (FFC0) to progressive SOF2 (FFC2)
    i = good.index(b"\xff\xc0")
    progressive = good[:i] + b"\xff\xc2" + good[i + 2 :]

    # fake native that returns garbage for ANYTHING without raising
    mod = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")

    class _Im:
        def __init__(self, data):
            # exact on the probe image, garbage otherwise
            try:
                w, h, px = jpeg.decode_jpeg_gray(bytes(data))
                self.size, self._px = (w, h), px
            except ValueError:
                self.size, self._px = (1, 1), b"\x00"
            self.mode = "L"

        def tobytes(self):
            return self._px

    image_mod.open = lambda fh: _Im(fh.read())
    mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    jpeg._NATIVE_DECODER = False
    # native adopted (probe passes), in-scope stream decodes identically
    assert jpeg.decode_jpeg_gray_fast(good) == jpeg.decode_jpeg_gray(good)
    assert jpeg._NATIVE_DECODER is not None
    # out-of-scope stream: the scope gate must route to the pure path,
    # which raises — NOT the garbage-returning native
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_gray_fast(progressive)
    jpeg._NATIVE_DECODER = False


def test_jpeg_scope_gate_rejects_16bit_dqt_and_subsampling(monkeypatch):
    """ADVICE r10: the scope gate must mirror TWO more of the pure
    decoder's rejections — 16-bit DQT precision (pq != 0) and SOF0
    sampling factor != 1x1.  A stream with either feature must route
    to the pure path (ValueError everywhere), never to an adopted
    native decoder that would happily decode it on PIL hosts only."""
    import sys
    import types

    import numpy as np
    import pytest

    from dogsheep_beta_spark.functions import jpeg

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=16 * 8, dtype=np.uint8).tobytes()
    good = jpeg.encode_jpeg_gray(16, 8, img)

    # (a) DQT with 16-bit precision: set the pq nibble of the first
    # quant table.  (Length stays 65 — the POINT is the gate must look
    # at the precision nibble, not the segment length.)
    i = good.index(b"\xff\xdb")
    dqt16 = bytearray(good)
    dqt16[i + 4] |= 0x10  # body[0] pq<<4 | tq
    dqt16 = bytes(dqt16)

    # (b) SOF0 with 2x2 subsampling: body[7] is the per-component
    # sampling byte (prec 1 + h 2 + w 2 + ncomp 1 + comp-id 1 → idx 7).
    j = good.index(b"\xff\xc0")
    sub22 = bytearray(good)
    sub22[j + 4 + 7] = 0x22
    sub22 = bytes(sub22)

    for bad in (dqt16, sub22):
        with pytest.raises(ValueError):
            jpeg.decode_jpeg_gray(bad)  # pure decoder rejects both

    # adopt a garbage-returning fake native (exact only on the probe)
    mod = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")

    class _Im:
        def __init__(self, data):
            try:
                w, h, px = jpeg.decode_jpeg_gray(bytes(data))
                self.size, self._px = (w, h), px
            except ValueError:
                self.size, self._px = (1, 1), b"\x00"
            self.mode = "L"

        def tobytes(self):
            return self._px

    image_mod.open = lambda fh: _Im(fh.read())
    mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    jpeg._NATIVE_DECODER = False
    assert jpeg.decode_jpeg_gray_fast(good) == jpeg.decode_jpeg_gray(good)
    assert jpeg._NATIVE_DECODER is not None  # native adopted
    for bad in (dqt16, sub22):
        with pytest.raises(ValueError):  # gate → pure path → raise
            jpeg.decode_jpeg_gray_fast(bad)
    jpeg._NATIVE_DECODER = False


def test_jpeg_scope_gate_rejects_any_dri(monkeypatch):
    """r11 code review: the pure decoder raises on ANY DRI marker —
    including a zero interval — so the scope gate must too, or a
    zero-interval DRI stream decodes via PIL on some hosts and raises
    on others."""
    import struct
    import sys
    import types

    import numpy as np
    import pytest

    from dogsheep_beta_spark.functions import jpeg

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, size=16 * 8, dtype=np.uint8).tobytes()
    good = jpeg.encode_jpeg_gray(16, 8, img)
    # splice a zero-interval DRI right after SOI
    dri0 = good[:2] + b"\xff\xdd" + struct.pack(">H", 4) + b"\x00\x00" + good[2:]
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_gray(dri0)  # pure decoder rejects ANY DRI

    mod = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")

    class _Im:
        def __init__(self, data):
            try:
                w, h, px = jpeg.decode_jpeg_gray(bytes(data))
                self.size, self._px = (w, h), px
            except ValueError:
                self.size, self._px = (1, 1), b"\x00"
            self.mode = "L"

        def tobytes(self):
            return self._px

    image_mod.open = lambda fh: _Im(fh.read())
    mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    jpeg._NATIVE_DECODER = False
    assert jpeg.decode_jpeg_gray_fast(good) == jpeg.decode_jpeg_gray(good)
    assert jpeg._NATIVE_DECODER is not None
    with pytest.raises(ValueError):  # gate → pure path → raise
        jpeg.decode_jpeg_gray_fast(dri0)
    jpeg._NATIVE_DECODER = False
