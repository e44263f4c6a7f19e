"""Pure-Python/numpy baseline JPEG codec (ITU T.81 sequential DCT).

De-stubs the engine's lossy format (r4 verdict #6): the container has no
libjpeg/Pillow, so this module implements the baseline profile from the
public spec — enough that the PSNR>=40dB round-trip invariant
(BASELINE.json input_hint) runs against a REAL lossy entropy-coded format:

- encoder: JFIF YCbCr, 4:4:4 (no subsampling), IJG quality-scaled Annex-K
  quantization tables, standard Annex-K Huffman tables, byte stuffing.
- decoder: baseline sequential only — SOF0, 8-bit, 1 or 3 components with
  1x1 sampling; progressive (SOF2), arithmetic coding, 12-bit, and
  subsampled streams raise DecodeError (fail-closed, like the audio/video
  codec gates).  Restart intervals are honored (DRI/RSTn).

Performance shape: the per-pixel math (color transform, DCT/IDCT,
quantization, zigzag) is vectorized over ALL blocks of a component at
once; only the entropy coder walks symbols in Python — with a peek-16
Huffman LUT (lists, not numpy scalars, for CPython indexing speed) that
loop is ~1 list index + a few int ops per symbol.  Images in this engine
are thumbnails (8-32 px), so blocks-per-image is single digits.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    pass


# ---------------------------------------------------------------------------
# spec tables (ITU T.81 Annex K)
# ---------------------------------------------------------------------------

QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)

QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# orthonormal 8-point DCT-II matrix: F = C f C^T, f = C^T F C.
# Kept float32 so every einsum below runs single-precision end to end
# (a float64 matrix silently upcasts the whole block tensor); all encode/
# decode/round-trip paths share it, so they stay bit-identical.
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) * \
            (np.sqrt(0.125) if _u == 0 else 0.5)
_C = _C.astype(np.float32)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QT_LUM, QT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical Huffman per T.81 C.2."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_lut(bits: list[int], vals: list[int]) -> tuple[list[int], list[int]]:
    """peek-16 tables: sym[peek], length[peek] (0 length = invalid code).
    Cached per (bits, vals): building 2x65536 entries costs ~10ms, and
    every stream from this encoder (or any standard-table encoder) shares
    the four Annex-K tables."""
    key = (tuple(bits), tuple(vals))
    hit = _DEC_LUTS.get(key)
    if hit is not None:
        return hit
    if len(_DEC_LUTS) >= 16:
        # foreign streams can each carry distinct custom DHTs (~1 MB of
        # LUT per table); cap the cache so adversarial corpora cannot
        # grow a long-lived decode actor unboundedly (FIFO eviction —
        # the standard Annex-K tables re-enter on first use anyway)
        _DEC_LUTS.pop(next(iter(_DEC_LUTS)))
    sym = [0] * 65536
    length = [0] * 65536
    code = 0
    k = 0
    for ln in range(1, 17):
        span = 1 << (16 - ln)
        for _ in range(bits[ln - 1]):
            base = code << (16 - ln)
            v = vals[k]
            sym[base:base + span] = [v] * span
            length[base:base + span] = [ln] * span
            code += 1
            k += 1
        code <<= 1
    _DEC_LUTS[key] = (sym, length)
    return sym, length


_ENC_TABLES = {}
_DEC_LUTS = {}


def _enc_tables():
    if not _ENC_TABLES:
        _ENC_TABLES["dc0"] = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
        _ENC_TABLES["ac0"] = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
        _ENC_TABLES["dc1"] = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
        _ENC_TABLES["ac1"] = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    return _ENC_TABLES


# ---------------------------------------------------------------------------
# color transforms (JFIF)
# ---------------------------------------------------------------------------

def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float32)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    # clip then +0.5/truncate = round-half-up on non-negative values —
    # one cheap pass instead of .round()'s banker's rint (every decode
    # path shares this function, so they stay bit-identical to each
    # other)
    out = np.empty(ycc.shape, dtype=np.float32)
    out[..., 0] = r
    out[..., 1] = g
    out[..., 2] = b
    np.clip(out, 0.0, 255.0, out=out)
    out += 0.5
    return out.astype(np.uint8)


# ---------------------------------------------------------------------------
# block helpers (vectorized across all blocks of a component)
# ---------------------------------------------------------------------------

def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(H, W) float -> (n_blocks, 8, 8), edge-replicated to 8-multiples."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    by, bx = hh // 8, ww // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) \
        .reshape(by * bx, 8, 8)
    return blocks, by, bx


def _from_blocks(blocks: np.ndarray, by: int, bx: int, h: int,
                 w: int) -> np.ndarray:
    plane = blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(by * 8, bx * 8)
    return plane[:h, :w]


def _fdct_quant(blocks: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """level shift + 2-D DCT + quantize + zigzag -> (n, 64) int32."""
    f = blocks.astype(np.float32) - 128.0
    F = np.einsum("ux,nxy,vy->nuv", _C, f, _C, optimize=True)
    q = np.round(F / qt.astype(np.float32)).astype(np.int32)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _dequant_idct(zz: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(n, 64) zigzag int32 -> (n, 8, 8) float pixels (+128, unclipped)."""
    F = (zz[:, UNZIGZAG].reshape(-1, 8, 8).astype(np.float32)
         * qt.astype(np.float32))
    f = np.einsum("xu,nuv,yv->nxy", _C.T, F, _C.T, optimize=True)
    return f + 128.0


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _bitsize(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per spec F.1.2.3
        return bytes(self.buf)


def _dht_segment(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    payload = bytes([tq]) + bytes(int(x) for x in
                                  table.reshape(64)[ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(payload) + 2) + payload


def encode_baseline(arr: np.ndarray, quality: int = 92) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (4:4:4)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_baseline expects (h, w, 3) uint8")
    h, w, _ = arr.shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("unsupported dimensions")
    qt_l, qt_c = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(arr)

    t = _enc_tables()
    bw = _BitWriter()
    comp_zz = []
    for ci in range(3):
        blocks, by, bx = _to_blocks(ycc[..., ci])
        comp_zz.append(_fdct_quant(blocks, qt_l if ci == 0 else qt_c))
    # interleaved MCU scan: with 1x1 sampling an MCU is one block of each
    # component in turn
    n_mcu = comp_zz[0].shape[0]
    preds = [0, 0, 0]
    put = bw.put
    dc_tabs = [t["dc0"], t["dc1"], t["dc1"]]
    ac_tabs = [t["ac0"], t["ac1"], t["ac1"]]
    for m in range(n_mcu):
        for ci in range(3):
            blk = comp_zz[ci][m]
            dc_codes, ac_codes = dc_tabs[ci], ac_tabs[ci]
            v0 = int(blk[0])
            diff = v0 - preds[ci]
            preds[ci] = v0
            s = _bitsize(diff)
            c, ln = dc_codes[s]
            put(c, ln)
            if s:
                put(diff if diff > 0 else diff + (1 << s) - 1, s)
            nz = np.flatnonzero(blk[1:]) + 1
            prev = 0
            for k in nz.tolist():
                run = k - prev - 1
                while run > 15:
                    c, ln = ac_codes[0xF0]
                    put(c, ln)
                    run -= 16
                v = int(blk[k])
                s = _bitsize(v)
                c, ln = ac_codes[(run << 4) | s]
                put(c, ln)
                put(v if v > 0 else v + (1 << s) - 1, s)
                prev = k
            if prev != 63:
                c, ln = ac_codes[0x00]
                put(c, ln)
    scan = bw.flush()

    head = bytearray()
    head += b"\xff\xd8"  # SOI
    head += (b"\xff\xe0" + struct.pack(">H", 16)
             + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    head += _dqt_segment(0, qt_l)
    head += _dqt_segment(1, qt_c)
    # SOF0: 8-bit, h, w, 3 components, all 1x1 sampling
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])
    head += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    head += _dht_segment(0x00, DC_LUM_BITS, DC_LUM_VALS)
    head += _dht_segment(0x10, AC_LUM_BITS, AC_LUM_VALS)
    head += _dht_segment(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS)
    head += _dht_segment(0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) \
        + bytes([0, 63, 0])
    head += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    return bytes(head) + scan + b"\xff\xd9"


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _Parsed:
    """Header + unstuffed scan of one baseline stream (shared by the
    scalar and the SIMD-across-streams batch decoders)."""

    __slots__ = ("h", "w", "ncomp", "comp_q", "qts", "dc_luts", "ac_luts",
                 "scan_comp", "scan", "rst_breaks", "restart_interval",
                 "std_tables")


def _parse(data: bytes) -> _Parsed:
    """Header+scan parse with the fail-closed contract: EVERY malformed
    stream surfaces as JpegError (struct/index errors from short segment
    bodies included), never a foreign exception type."""
    try:
        return _parse_inner(data)
    except JpegError:
        raise
    except (struct.error, IndexError) as e:
        raise JpegError(f"malformed segment: {e}") from e


def _parse_inner(data: bytes) -> _Parsed:
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise JpegError("bad JPEG SOI")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_luts: dict[int, tuple[list[int], list[int]]] = {}
    ac_luts: dict[int, tuple[list[int], list[int]]] = {}
    h = w = 0
    ncomp = 0
    comp_q: list[int] = []
    comp_id: list[int] = []
    restart_interval = 0
    scan_comp: list[tuple[int, int, int]] = []  # (comp_idx, dc_t, ac_t)
    scan_start = -1
    dht_sig: dict[tuple[int, int], tuple] = {}

    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise JpegError("marker sync lost")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before SOS
            raise JpegError("no scan data")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > n:
            raise JpegError("truncated segment header")
        seglen = struct.unpack_from(">H", data, pos)[0]
        if seglen < 2 or pos + seglen > n:
            raise JpegError("truncated segment")
        body = data[pos + 2: pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 15
                o += 1
                if pq != 0:
                    raise JpegError("16-bit quant tables unsupported")
                if o + 64 > len(body):
                    raise JpegError("truncated DQT")
                zz = np.frombuffer(body[o:o + 64], dtype=np.uint8) \
                    .astype(np.int32)
                t = np.zeros(64, dtype=np.int32)
                t[ZIGZAG] = zz
                qts[tq] = t.reshape(8, 8)
                o += 64
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 15
                o += 1
                if o + 16 > len(body):
                    raise JpegError("truncated DHT")
                bits = list(body[o:o + 16])
                o += 16
                nv = sum(bits)
                if o + nv > len(body):
                    raise JpegError("truncated DHT values")
                vals = list(body[o:o + nv])
                o += nv
                lut = _decode_lut(bits, vals)
                (dc_luts if tc == 0 else ac_luts)[th] = lut
                dht_sig[(tc, th)] = (tuple(bits), tuple(vals))
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec = body[0]
            if prec != 8:
                raise JpegError("only 8-bit baseline supported")
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise JpegError(f"unsupported component count {ncomp}")
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c: 9 + 3 * c]
                if samp != 0x11:
                    raise JpegError("subsampling unsupported (4:4:4 only)")
                comp_id.append(cid)
                comp_q.append(tq)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegError("non-baseline JPEG (progressive/arithmetic)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != ncomp:
                raise JpegError("partial scans unsupported")
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                try:
                    ci = comp_id.index(cid)
                except ValueError:
                    raise JpegError("scan references unknown component") \
                        from None
                scan_comp.append((ci, tabs >> 4, tabs & 15))
            scan_start = pos
            break
        # else: APPn/COM/etc — skipped
    if scan_start < 0 or h == 0 or w == 0:
        raise JpegError("missing SOF/SOS")
    for ci in range(ncomp):
        if comp_q[ci] not in qts:
            raise JpegError("missing quant table")
    for ci, dct, act in scan_comp:
        if dct not in dc_luts or act not in ac_luts:
            raise JpegError("missing huffman table")

    # ---- unstuff the entropy scan (find()-jumps, not per-byte Python) ----
    body = data[scan_start:]
    out = bytearray()
    i = 0
    bn = len(body)
    rst_breaks: list[int] = []  # unstuffed offsets where RSTn occurred
    while True:
        j = body.find(b"\xff", i)
        if j < 0 or j + 1 >= bn:
            raise JpegError("truncated scan (missing EOI)")
        out += body[i:j]
        m = body[j + 1]
        if m == 0x00:
            out.append(0xFF)
            i = j + 2
        elif 0xD0 <= m <= 0xD7:
            rst_breaks.append(len(out))
            i = j + 2
        elif m == 0xD9:
            break
        else:
            raise JpegError(f"unexpected marker 0x{m:02x} in scan")

    p = _Parsed()
    p.h, p.w, p.ncomp = h, w, ncomp
    p.comp_q, p.qts = comp_q, qts
    p.dc_luts, p.ac_luts = dc_luts, ac_luts
    p.scan_comp = scan_comp
    p.scan = bytes(out)
    p.rst_breaks = rst_breaks
    p.restart_interval = restart_interval
    p.std_tables = (
        ncomp == 3
        and dht_sig.get((0, scan_comp[0][1]))
        == (tuple(DC_LUM_BITS), tuple(DC_LUM_VALS))
        and dht_sig.get((1, scan_comp[0][2]))
        == (tuple(AC_LUM_BITS), tuple(AC_LUM_VALS))
        and all(dht_sig.get((0, scan_comp[c][1]))
                == (tuple(DC_CHROMA_BITS), tuple(DC_CHROMA_VALS))
                and dht_sig.get((1, scan_comp[c][2]))
                == (tuple(AC_CHROMA_BITS), tuple(AC_CHROMA_VALS))
                for c in (1, 2)))
    return p


def decode_baseline(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB (grayscale replicated).

    Raises :class:`JpegError` on anything outside the baseline profile
    this encoder emits (progressive, arithmetic, subsampling != 1x1,
    bit depth != 8) and on truncated/corrupt streams."""
    p = _parse(data)
    h, w, ncomp = p.h, p.w, p.ncomp
    restart_interval = p.restart_interval
    scan = p.scan + b"\x00\x00\x00\x00"  # final refill never IndexErrors
    rst_breaks = p.rst_breaks

    by, bx = -(-h // 8), -(-w // 8)
    n_mcu = by * bx
    coefs = [np.zeros((n_mcu, 64), dtype=np.int32) for _ in range(ncomp)]
    dc_tabs = [p.dc_luts[t[1]] for t in p.scan_comp]
    ac_tabs = [p.ac_luts[t[2]] for t in p.scan_comp]
    order = [t[0] for t in p.scan_comp]

    acc = 0
    navail = 0
    bytepos = 0
    preds = [0] * ncomp
    rst_iter = iter(rst_breaks)
    next_rst = next(rst_iter, -1)
    try:
        for m in range(n_mcu):
            if restart_interval and m and m % restart_interval == 0:
                # byte-align and resync at the recorded restart boundary
                if next_rst < 0:
                    raise JpegError("missing restart marker")
                acc = 0
                navail = 0
                bytepos = next_rst
                next_rst = next(rst_iter, -1)
                preds = [0] * ncomp
            for si in range(ncomp):
                ci = order[si]
                dsym, dlen = dc_tabs[si]
                asym, alen = ac_tabs[si]
                blk = coefs[ci]
                # --- DC ---
                while navail < 16:
                    acc = (acc << 8) | scan[bytepos]
                    bytepos += 1
                    navail += 8
                peek = (acc >> (navail - 16)) & 0xFFFF
                s = dsym[peek]
                ln = dlen[peek]
                if ln == 0:
                    raise JpegError("invalid huffman code")
                navail -= ln
                acc &= (1 << navail) - 1  # keep acc O(1) bits, not O(scan)
                if s:
                    while navail < s:
                        acc = (acc << 8) | scan[bytepos]
                        bytepos += 1
                        navail += 8
                    v = (acc >> (navail - s)) & ((1 << s) - 1)
                    navail -= s
                    acc &= (1 << navail) - 1
                    if v < (1 << (s - 1)):
                        v -= (1 << s) - 1
                    preds[ci] += v
                blk[m, 0] = preds[ci]
                # --- AC ---
                k = 1
                while k < 64:
                    while navail < 16:
                        acc = (acc << 8) | scan[bytepos]
                        bytepos += 1
                        navail += 8
                    peek = (acc >> (navail - 16)) & 0xFFFF
                    rs = asym[peek]
                    ln = alen[peek]
                    if ln == 0:
                        raise JpegError("invalid huffman code")
                    navail -= ln
                    acc &= (1 << navail) - 1
                    s = rs & 15
                    if s == 0:
                        if rs == 0xF0:
                            k += 16
                            continue
                        break  # EOB
                    k += rs >> 4
                    if k > 63:
                        raise JpegError("AC index overflow")
                    while navail < s:
                        acc = (acc << 8) | scan[bytepos]
                        bytepos += 1
                        navail += 8
                    v = (acc >> (navail - s)) & ((1 << s) - 1)
                    navail -= s
                    acc &= (1 << navail) - 1
                    if v < (1 << (s - 1)):
                        v -= (1 << s) - 1
                    blk[m, k] = v
                    k += 1
            # bound runaway reads: the padding is 4 zero bytes; running
            # past it means the stream was truncated
            if bytepos > len(scan):
                raise JpegError("truncated entropy data")
    except IndexError:
        raise JpegError("truncated entropy data") from None

    planes = []
    for ci in range(ncomp):
        qt = p.qts[p.comp_q[ci]]
        px = _dequant_idct(coefs[ci], qt)
        planes.append(_from_blocks(px, by, bx, h, w))
    if ncomp == 1:
        y = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    ycc = np.stack(planes, axis=-1)
    return _ycbcr_to_rgb(ycc)


# ---------------------------------------------------------------------------
# SIMD-across-streams batch decoder
# ---------------------------------------------------------------------------

_NP_LUTS: dict[str, np.ndarray] = {}


def _np_luts():
    """The four Annex-K tables as numpy peek-16 arrays, indexed
    [is_chroma, peek] — shared by every stream this encoder emits."""
    if not _NP_LUTS:
        def pair(bits, vals):
            sym, ln = _decode_lut(bits, vals)
            return (np.array(sym, dtype=np.int16),
                    np.array(ln, dtype=np.int8))
        ds0, dl0 = pair(DC_LUM_BITS, DC_LUM_VALS)
        ds1, dl1 = pair(DC_CHROMA_BITS, DC_CHROMA_VALS)
        as0, al0 = pair(AC_LUM_BITS, AC_LUM_VALS)
        as1, al1 = pair(AC_CHROMA_BITS, AC_CHROMA_VALS)
        _NP_LUTS["dc_sym"] = np.stack([ds0, ds1])
        _NP_LUTS["dc_len"] = np.stack([dl0, dl1])
        _NP_LUTS["ac_sym"] = np.stack([as0, as1])
        _NP_LUTS["ac_len"] = np.stack([al0, al1])
    return _NP_LUTS


def packed_lut() -> np.ndarray:
    """The four Annex-K peek-16 tables merged into ONE ``(4, 65536)``
    int16 gather — entry ``(code_len << 8) | symbol``, first axis
    ``(is_dc << 1) | is_chroma``.  This is 512 KB of read-only,
    gather-hot state: the unit the decode pipeline broadcasts through
    the Ray object store (see ``stages.decode.shared_jpeg_lut_ref``) so
    every worker on a node maps the SAME physical pages instead of each
    building a private copy — one replica per node at cluster scale,
    one LLC-resident copy per box instead of one per worker locally."""
    lut_all = _NP_LUTS.get("packed")
    if lut_all is None:
        luts = _np_luts()
        sym_all = np.stack([luts["ac_sym"][0], luts["ac_sym"][1],
                            luts["dc_sym"][0], luts["dc_sym"][1]]) \
            .astype(np.int64)
        len_all = np.stack([luts["ac_len"][0], luts["ac_len"][1],
                            luts["dc_len"][0], luts["dc_len"][1]]) \
            .astype(np.int64)
        lut_all = _NP_LUTS["packed"] = ((len_all << 8) | sym_all) \
            .astype(np.int16)
    return lut_all


def set_packed_lut(arr: np.ndarray) -> None:
    """Inject a pre-built packed LUT (typically a read-only plasma-backed
    view from ``ray.get``) so this process gathers from shared pages.
    The table is a pure function of the Annex-K constants, so injection
    is bit-identical to the local build (tested); every decode path only
    ever reads it."""
    if arr.shape != (4, 65536) or arr.dtype != np.int16:
        raise ValueError(f"packed LUT must be (4, 65536) int16, got "
                         f"{arr.shape} {arr.dtype}")
    _NP_LUTS["packed"] = arr


def _decode_entropy_batch(parsed: list[_Parsed]):
    """Entropy-decode many standard-table 3-component baseline scans in
    lockstep: one numpy step decodes ONE Huffman symbol in EVERY still-
    active stream, so the Python interpreter cost amortizes across the
    batch.  Finished lanes are compacted away, the four Annex-K LUTs are
    merged into one (is_dc, is_chroma)-indexed gather, and each step
    refills once to >= 27 bits (max symbol+value consumption), so the
    inner loop is ~a dozen vector ops.

    Returns (coefs, err): one (n_mcu, 3, 64) int32 zigzag coefficient
    array per stream, plus a bool mask of corrupt lanes (truncated /
    invalid code / AC overflow) — corrupt lanes are dropped from the
    lockstep immediately and the caller re-decodes them with the scalar
    walker for its exact error classification.
    """
    n = len(parsed)
    # merged LUT axis: (is_dc << 1) | is_chroma; symbol (<=0xFA) and code
    # length pack into one int16 gather: entry = (len << 8) | sym
    lut_all = packed_lut()

    n_mcu_full = np.array([(-(-p.h // 8)) * (-(-p.w // 8)) for p in parsed],
                          dtype=np.int64)
    scan_len = np.array([len(p.scan) for p in parsed], dtype=np.int64)
    maxlen = int(scan_len.max()) + 8  # slack: lookahead refills past EOB
    buf = np.zeros((n, maxlen), dtype=np.uint8)
    for i, p in enumerate(parsed):
        buf[i, :len(p.scan)] = np.frombuffer(p.scan, dtype=np.uint8)

    max_mcu = int(n_mcu_full.max())
    coef = np.zeros(n * max_mcu * 3 * 64, dtype=np.int32)  # flat scatter
    pred = np.zeros((n, 3), dtype=np.int64)
    err = np.zeros(n, dtype=bool)

    # live-lane state (compacted as lanes finish or go bad)
    orig = np.flatnonzero(n_mcu_full > 0)
    acc = np.zeros(len(orig), dtype=np.int64)
    navail = np.zeros(len(orig), dtype=np.int64)
    bytepos = np.zeros(len(orig), dtype=np.int64)
    mcu = np.zeros(len(orig), dtype=np.int64)
    comp = np.zeros(len(orig), dtype=np.int64)
    k = np.zeros(len(orig), dtype=np.int64)  # 0 = DC phase
    n_mcu = n_mcu_full[orig]
    slen = scan_len[orig]
    one = np.int64(1)

    while len(orig):
        # ---- refill once to >= 27 bits (16 code + max 11 value bits);
        # clamp reads so an already-overrun (corrupt) lane stays in
        # bounds until it is dropped below ----
        need = navail < 27
        while need.any():
            # two bytes per pass (typical consumption is 12-20 bits, so
            # one pass usually suffices); reading ahead is harmless and
            # corrupt overruns stay clamped until dropped below
            pos = np.minimum(bytepos[need], maxlen - 2)
            lane = orig[need]
            acc[need] = (acc[need] << 16) \
                | (buf[lane, pos].astype(np.int64) << 8) \
                | buf[lane, pos + 1]
            bytepos[need] += 2
            navail[need] += 16
            need = navail < 27
        drop = bytepos > slen + 8  # consumed past scan + lookahead slack

        # ---- one Huffman symbol everywhere ----
        is_dc = k == 0
        ti = (is_dc.astype(np.int64) << 1) | (comp != 0)
        peek = (acc >> (navail - 16)) & 0xFFFF
        e = lut_all[ti, peek].astype(np.int64)
        sym = e & 0xFF
        ln = e >> 8
        drop |= ln == 0  # invalid huffman code
        navail -= ln

        # ---- value bits (s == 0 lanes read 0 bits harmlessly) ----
        s = np.where(is_dc, sym, sym & 15)
        v = (acc >> np.maximum(navail - s, 0)) & ((one << s) - 1)
        navail -= s
        half = one << np.maximum(s - 1, 0)
        v = np.where((s > 0) & (v < half), v - (one << s) + 1, v)
        v = np.where(s > 0, v, 0)

        # ---- DC commit ----
        is_dc &= ~drop
        if is_dc.any():
            di = orig[is_dc]
            ci = comp[is_dc]
            pred[di, ci] += v[is_dc]
            coef[((di * max_mcu + mcu[is_dc]) * 3 + ci) * 64] = \
                pred[di, ci]
            k[is_dc] = 1

        # ---- AC paths ----
        is_ac = (k != 0) & ~is_dc & ~drop
        zrl = is_ac & (sym == 0xF0)
        eob = is_ac & (sym == 0x00)
        place = is_ac & (s > 0)
        if place.any():
            k[place] += sym[place] >> 4
            over = place & (k > 63)  # run walked out of the block
            drop |= over
            place &= ~over
            coef[((orig[place] * max_mcu + mcu[place]) * 3
                  + comp[place]) * 64 + k[place]] = v[place]
            k[place] += 1
        k[zrl] += 16
        # block end: EOB, coefficient 63 written, or ZRL walked past 63
        # (the scalar walker's loop-exit leniency, mirrored)
        blk_done = (eob | (k > 63)) & ~drop
        if blk_done.any() or drop.any():
            comp[blk_done] += 1
            k[blk_done] = 0
            wrap = comp == 3
            comp[wrap] = 0
            mcu[wrap] += 1
            err[orig[drop]] = True
            alive = (mcu < n_mcu) & ~drop
            if not alive.all():
                orig = orig[alive]
                acc, navail = acc[alive], navail[alive]
                bytepos, mcu = bytepos[alive], mcu[alive]
                comp, k = comp[alive], k[alive]
                n_mcu, slen = n_mcu[alive], slen[alive]

    coef = coef.reshape(n, max_mcu, 3, 64)
    return [coef[i, :n_mcu_full[i]] for i in range(n)], err


def decode_baseline_batch(datas: list[bytes], *, errors: str = "raise"):
    """Decode many baseline JPEGs, vectorizing the entropy pass across
    streams and the dequant/IDCT/color math across every block of every
    stream.  Outputs are BIT-IDENTICAL to :func:`decode_baseline`
    (differentially tested); streams the lockstep path cannot take
    (non-standard tables, restart intervals, grayscale) and corrupt lanes
    fall back to the scalar decoder for its exact error classification.

    ``errors="raise"`` re-raises the first lane's exception;
    ``errors="return"`` puts the exception object in that lane's slot
    (the DecodeValidator contract: per-row verdicts, not batch failure).
    """
    parsed: list = []
    for d in datas:
        try:
            parsed.append(_parse(d))
        except Exception as e:  # noqa: BLE001 — per-lane verdicts
            parsed.append(e)
    fast = [i for i, p in enumerate(parsed)
            if isinstance(p, _Parsed) and p.std_tables
            and not p.restart_interval and p.ncomp == 3]
    out: list = [None] * len(datas)
    if fast:
        ps = [parsed[i] for i in fast]
        coefs, lane_err = _decode_entropy_batch(ps)
        good = [j for j in range(len(fast)) if not lane_err[j]]
        if good:
            # dequant + IDCT + color over EVERY block of EVERY stream in
            # one shot (4:4:4 means a block's Y/Cb/Cr cover the same 8x8
            # patch, so color conversion is block-local); only the final
            # per-image reshape runs per stream
            counts = np.array([coefs[j].shape[0] for j in good],
                              dtype=np.int64)
            zz_all = np.concatenate([coefs[j] for j in good], axis=0)
            qts3 = np.stack([
                np.stack([ps[j].qts[ps[j].comp_q[ci]].reshape(64)
                          for ci in range(3)]) for j in good])
            qt_all = np.repeat(qts3, counts, axis=0).astype(np.float32)
            F = (zz_all[:, :, UNZIGZAG].astype(np.float32)
                 * qt_all).reshape(-1, 8, 8)
            f = np.einsum("xu,nuv,yv->nxy", _C.T, F, _C.T,
                          optimize=True) + 128.0
            rgb = _ycbcr_to_rgb(
                f.reshape(-1, 3, 8, 8).transpose(0, 2, 3, 1))  # (T,8,8,3)
            off = 0
            for j, c in zip(good, counts):
                p = ps[j]
                by, bx = -(-p.h // 8), -(-p.w // 8)
                blk = rgb[off:off + c]
                img = blk.reshape(by, bx, 8, 8, 3) \
                    .transpose(0, 2, 1, 3, 4) \
                    .reshape(by * 8, bx * 8, 3)
                out[fast[j]] = np.ascontiguousarray(img[:p.h, :p.w])
                off += c
    for i, d in enumerate(datas):
        if out[i] is None:
            try:
                if isinstance(parsed[i], Exception):
                    raise parsed[i]
                out[i] = decode_baseline(d)
            except Exception as e:  # noqa: BLE001
                if errors == "raise":
                    raise
                out[i] = e
    return out


def lossy_roundtrip(arr: np.ndarray, quality: int = 92) -> np.ndarray:
    """Pixels after one encode->decode cycle, WITHOUT running the entropy
    coder: Huffman coding is lossless/bijective, so quantize->dequantize in
    the DCT domain yields bit-identical pixels to
    ``decode_baseline(encode_baseline(arr, q))`` (equality-tested) at a
    tiny fraction of the cost — this is what the per-row PSNR>=40dB
    round-trip check calls in the hot path."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("lossy_roundtrip expects (h, w, 3) uint8")
    h, w, _ = arr.shape
    qt_l, qt_c = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(arr)
    planes = []
    for ci in range(3):
        blocks, by, bx = _to_blocks(ycc[..., ci])
        zz = _fdct_quant(blocks, qt_l if ci == 0 else qt_c)
        px = _dequant_idct(zz, qt_l if ci == 0 else qt_c)
        planes.append(_from_blocks(px, by, bx, h, w))
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))


def lossy_roundtrip_batch(arrs: list[np.ndarray],
                          quality: int = 92) -> list[np.ndarray]:
    """:func:`lossy_roundtrip` for many images at once: every image's
    pixels color-convert in ONE pass, and ALL blocks of ALL channels run
    one forward + one inverse DCT einsum with the per-channel quant
    tables stacked on a trailing axis (the contraction is per-block /
    per-channel independent, so results stay bit-identical — tested).
    Per-image work collapses to the blocking/reassembly reshape.  The
    DecodeValidator's round-trip hot path."""
    if not arrs:
        return []
    qt_l, qt_c = _quality_tables(quality)
    qt3 = np.stack([qt_l, qt_c, qt_c], axis=-1).astype(np.float32)  # (8,8,3)
    # one rgb->ycc pass over every pixel of every image
    flat = np.concatenate([a.reshape(-1, 3) for a in arrs])
    ycc_flat = _rgb_to_ycbcr(flat)
    offs = np.zeros(len(arrs) + 1, dtype=np.int64)
    np.cumsum([a.shape[0] * a.shape[1] for a in arrs], out=offs[1:])
    blocks, metas = [], []
    for j, arr in enumerate(arrs):
        h, w = arr.shape[:2]
        ycc = ycc_flat[offs[j]:offs[j + 1]].reshape(h, w, 3)
        ph, pw = -h % 8, -w % 8
        if ph or pw:
            ycc = np.pad(ycc, ((0, ph), (0, pw), (0, 0)), mode="edge")
        hh, ww = ycc.shape[:2]
        by, bx = hh // 8, ww // 8
        blocks.append(ycc.reshape(by, 8, bx, 8, 3)
                      .transpose(0, 2, 1, 3, 4).reshape(by * bx, 8, 8, 3))
        metas.append((h, w, by, bx, by * bx))
    B = np.concatenate(blocks) - 128.0
    F = np.einsum("ux,nxyc,vy->nuvc", _C, B, _C, optimize=True)
    zz = np.round(F / qt3).astype(np.int32)
    Fq = zz.astype(np.float32) * qt3
    f = np.einsum("xu,nuvc,yv->nxyc", _C.T, Fq, _C.T, optimize=True) + 128.0
    rgb = _ycbcr_to_rgb(f)  # (T, 8, 8, 3) uint8
    out = []
    lo = 0
    for h, w, by, bx, nb in metas:
        img = rgb[lo:lo + nb].reshape(by, bx, 8, 8, 3) \
            .transpose(0, 2, 1, 3, 4).reshape(by * 8, bx * 8, 3)
        out.append(np.ascontiguousarray(img[:h, :w]))
        lo += nb
    return out
