"""Baseline JPEG (grayscale) encode/decode in pure Python + numpy —
the MJPEG-in-AVI frame codec (VERDICT r8 #7: the one compressed-video
codec implementable without new dependencies).

Scope (documented, not a stub): BASELINE sequential DCT, single
8-bit component (grayscale), no subsampling, no restart markers, no
progressive/arithmetic modes — exactly what the MJPEG fixture writer
emits and what `operators/multimodal.mjpeg_frame_table` decodes.  A
marker outside this scope raises ValueError loudly.

Reference parity: container/marker layout follows ITU-T T.81 (the
public JPEG spec); the Huffman tables are the spec's Annex K.3.3
typical luminance tables.  The reference engine delegates media
decoding to system codec libraries (dogsheep-beta itself stores media
as opaque blobs); this module exists so the Spark pipeline's
frame-decode path is real, not a NotImplementedError.

Determinism contract: quantization uses round-half-away-from-zero
(sign * floor(|x|/q + 0.5)) and the IDCT output rounds half-up after
clamping — every step integer-or-correctly-rounded, so
decode(encode(img)) is bit-stable across hosts, and for a CONSTANT
block under an all-8 quant table the round-trip is EXACT (DC = 8*(v-128)
quantizes by /8 with no remainder; AC all zero) — the property the
declared query's arithmetic oracle pins.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index i of the scan -> (row, col) flattened offset
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# flat quant table: exact round-trip for constant blocks (see module doc)
QUANT_FLAT8 = [8] * 64

# ITU-T T.81 Annex K.3.3.1/K.3.3.2 — typical luminance Huffman tables
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits, vals):
    """(symbol -> (code, length)) canonical Huffman assignment, spec
    order: codes of each length count up from twice the previous
    length's last code + 1."""
    out = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(DC_BITS, DC_VALS)
_AC_ENC = _canonical_codes(AC_BITS, AC_VALS)


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


_C = _dct_matrix()


def _size_cat(v: int) -> int:
    """DC/AC magnitude category: smallest s with |v| < 2^s."""
    s, a = 0, abs(int(v))
    while a:
        s += 1
        a >>= 1
    return s


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


def encode_jpeg_gray(
    width: int, height: int, pixels: bytes, quant=None
) -> bytes:
    """Baseline grayscale JPEG of a row-major 8-bit image.  Edge
    blocks pad by edge replication (decoder crops back to the SOF
    dimensions).  ``quant``: 64 ints in RASTER order (default: the
    flat all-8 table — see module doc for why)."""
    if len(pixels) != width * height:
        raise ValueError("pixels length != width*height")
    q = np.asarray(quant if quant is not None else QUANT_FLAT8, np.float64)
    if q.shape != (64,) or (q < 1).any() or (q > 255).any():
        raise ValueError("quant must be 64 values in 1..255")
    img = np.frombuffer(pixels, np.uint8).reshape(height, width)
    bw, bh = -(-width // 8), -(-height // 8)
    padded = np.pad(
        img, ((0, bh * 8 - height), (0, bw * 8 - width)), mode="edge"
    ).astype(np.float64) - 128.0
    qm = q.reshape(8, 8)

    w = _BitWriter()
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            f = _C @ blk @ _C.T
            coef = (np.sign(f) * np.floor(np.abs(f) / qm + 0.5)).astype(
                np.int64
            )
            zz = coef.reshape(-1)[ZIGZAG]
            # DC difference
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            s = _size_cat(diff)
            code, ln = _DC_ENC[s]
            w.put(code, ln)
            if s:
                w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
            # AC run-length
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if zz.any() else 0
            for i in range(1, 64):
                v = int(zz[i])
                if v == 0:
                    if i > last_nz:
                        code, ln = _AC_ENC[0x00]  # EOB
                        w.put(code, ln)
                        break
                    run += 1
                    if run == 16:
                        code, ln = _AC_ENC[0xF0]  # ZRL
                        w.put(code, ln)
                        run = 0
                    continue
                s = _size_cat(v)
                code, ln = _AC_ENC[(run << 4) | s]
                w.put(code, ln)
                w.put(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    zz_q = bytes(int(q[ZIGZAG[i]]) for i in range(64))
    dqt = seg(0xFFDB, b"\x00" + zz_q)
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 1) + bytes((1, 0x11, 0)),
    )
    dht = seg(
        0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)
    ) + seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    sos = seg(0xFFDA, b"\x01" + bytes((1, 0x00)) + bytes((0, 63, 0)))
    return b"\xff\xd8" + dqt + sof + dht + sos + w.flush() + b"\xff\xd9"


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated at 0xFF")
            m = self.data[self.pos]
            if m == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(f"unexpected marker 0xFF{m:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _decode_tree(bits, vals):
    """((length, code) -> symbol) for bit-serial canonical decode."""
    out = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(br: _BitReader, tree) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.bit()
        length += 1
        sym = tree.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg_gray(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, row-major pixels) of a baseline grayscale JPEG
    as written by ``encode_jpeg_gray`` (or any single-component
    baseline file using one DC + one AC table, no restart markers).
    Raises ValueError on anything outside that scope."""
    try:
        return _decode_jpeg_gray(data)
    except (IndexError, struct.error) as e:
        # a segment whose declared length outruns the buffer indexes
        # past the end — truncation, not a crash
        raise ValueError(f"truncated JPEG: {e}") from e


def _decode_jpeg_gray(data: bytes) -> tuple[int, int, bytes]:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    dc_tree = ac_tree = None
    width = height = None
    comp_tq = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker sync lost at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI without SOS
            raise ValueError("EOI before scan data")
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = body
            while b:
                pq, tq = b[0] >> 4, b[0] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros(64, np.int64)
                for i in range(64):
                    t[ZIGZAG[i]] = b[1 + i]
                quant[tq] = t
                b = b[65:]
        elif marker == 0xC0:  # SOF0 baseline
            _prec, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp != 1:
                raise ValueError("only single-component (grayscale) JPEG")
            if body[7] != 0x11:
                raise ValueError("subsampling unsupported")
            comp_tq = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise ValueError("non-baseline JPEG mode unsupported")
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            b = body
            while b:
                cls, _tid = b[0] >> 4, b[0] & 0xF
                bits = list(b[1:17])
                n = sum(bits)
                vals = list(b[17 : 17 + n])
                if cls == 0:
                    dc_tree = _decode_tree(bits, vals)
                else:
                    ac_tree = _decode_tree(bits, vals)
                b = b[17 + n :]
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            if width is None or dc_tree is None or ac_tree is None:
                raise ValueError("SOS before SOF/DHT")
            scan = data[pos:]
            br = _BitReader(scan)
            q = quant[comp_tq].reshape(8, 8).astype(np.float64)
            bw, bh = -(-width // 8), -(-height // 8)
            out = np.zeros((bh * 8, bw * 8), np.float64)
            pred = 0
            for by in range(bh):
                for bx in range(bw):
                    zz = np.zeros(64, np.int64)
                    s = _read_symbol(br, dc_tree)
                    diff = _extend(br.bits(s), s) if s else 0
                    pred += diff
                    zz[0] = pred
                    i = 1
                    while i < 64:
                        rs = _read_symbol(br, ac_tree)
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            i += 16
                            continue
                        i += rs >> 4
                        s = rs & 0xF
                        if i > 63:
                            raise ValueError("AC coefficient overrun")
                        zz[i] = _extend(br.bits(s), s)
                        i += 1
                    coef = np.zeros(64, np.float64)
                    coef[ZIGZAG] = zz
                    blk = _C.T @ (coef.reshape(8, 8) * q) @ _C
                    out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
            px = np.clip(np.floor(out + 128.0 + 0.5), 0, 255).astype(
                np.uint8
            )
            return width, height, px[:height, :width].tobytes()
        # other markers (APPn, COM): skipped via their length field
    raise ValueError("no SOS marker found")


# ---------------------------------------------------------------------------
# capability-probed native decode (r10 — VERDICT r9 #6)
# ---------------------------------------------------------------------------

_NATIVE_DECODER = False  # False = unprobed, None = probed-absent/rejected


def _probe_native_decoder():
    """Probe for an accelerated baseline-JPEG decoder (PIL/libjpeg).

    The pure-Python decoder above stays the ORACLE path — the strict-
    hash oracle pins the whole encode→demux→decode chain byte-exact
    through it.  A native decoder is only adopted if (a) it imports,
    and (b) it reproduces the pure decoder BYTE-FOR-BYTE on a
    self-encoded probe image exercising DC prediction, AC runs and
    edge-block cropping.  Anything else (absent, lossy SIMD rounding,
    subtly different IDCT) falls back to pure Python — same contract,
    so `mjpeg_frame_table` needs no knowledge of which path runs.
    This is the 100 TB story for media: wire the fast library behind
    the same function contract, keep the reference implementation as
    the correctness anchor."""
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except Exception:
        return None

    def _in_pure_scope(data: bytes) -> bool:
        """True iff the stream is inside the PURE decoder's documented
        scope (baseline SOF0, single component, one DC + one AC table,
        no restart intervals).  PIL happily decodes color /
        progressive / DRI streams that `_decode_jpeg_gray` rejects —
        dispatching those to the native path would make output
        ENVIRONMENT-DEPENDENT (rows on one host, ValueError on
        another), so anything outside scope falls back to the pure
        path and fails or succeeds identically everywhere
        (code-review r10)."""
        if data[:2] != b"\xff\xd8":
            return False
        pos = 2
        dht_classes: list[int] = []
        sof_seen = False
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                return False
            marker = data[pos + 1]
            if marker == 0xDA:  # SOS — header scan complete
                return (
                    sof_seen
                    and dht_classes.count(0) <= 1
                    and dht_classes.count(1) <= 1
                )
            (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            body = data[pos + 4 : pos + 2 + ln]
            if marker == 0xC0:  # baseline SOF
                # mirror the pure decoder exactly: single component AND
                # 1x1 sampling (body[7] == 0x11 raises otherwise,
                # _decode_jpeg_gray above) — ADVICE r10
                if len(body) < 9 or body[5] != 1 or body[7] != 0x11:
                    return False
                sof_seen = True
            elif marker in range(0xC1, 0xD0) and marker not in (0xC4, 0xC8, 0xCC):
                return False  # progressive/extended/lossless SOF
            elif marker == 0xDB:  # DQT: pure decoder rejects 16-bit (pq != 0)
                b = body
                while b:
                    if (b[0] >> 4) != 0:
                        return False
                    b = b[65:]
            elif marker == 0xDD:  # DRI: pure decoder rejects ANY
                # restart-interval marker — even interval 0 or a
                # truncated body (r11 code review: the old nonzero-only
                # check let a zero-interval DRI reach PIL on hosts that
                # have it while raising on hosts that don't)
                return False
            elif marker == 0xC4:  # DHT: record table classes
                b = body
                while len(b) >= 17:
                    dht_classes.append(b[0] >> 4)
                    n = sum(b[1:17])
                    b = b[17 + n :]
            pos += 2 + ln
        return False

    def native(data: bytes) -> tuple[int, int, bytes]:
        if not _in_pure_scope(data):
            return decode_jpeg_gray(data)  # identical everywhere
        im = Image.open(io.BytesIO(data))
        if im.mode != "L":
            # scope scan said single-component; trust the oracle path
            return decode_jpeg_gray(data)
        w, h = im.size
        return w, h, im.tobytes()

    try:
        rng = np.random.RandomState(7)
        w, h = 13, 9  # non-multiple-of-8: edge replication + crop
        px = rng.randint(0, 256, size=w * h, dtype=np.uint8).tobytes()
        probe = encode_jpeg_gray(w, h, px)
        if native(probe) != _decode_jpeg_gray(probe):
            return None
    except Exception:
        return None
    return native


def decode_jpeg_gray_fast(data: bytes) -> tuple[int, int, bytes]:
    """`decode_jpeg_gray`'s exact contract, dispatched to a probed
    native decoder when one is present and byte-exact (see
    `_probe_native_decoder`), else the pure-Python path.  The probe
    runs once per process (each Arrow worker pays it once, amortized
    over every frame it decodes)."""
    global _NATIVE_DECODER
    if _NATIVE_DECODER is False:
        _NATIVE_DECODER = _probe_native_decoder()
    if _NATIVE_DECODER is not None:
        return _NATIVE_DECODER(data)
    return decode_jpeg_gray(data)
