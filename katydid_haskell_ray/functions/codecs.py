"""Pure-python image codecs for the image+caption validation table.

The container has no Pillow / libjpeg / libpng, so the engine ships minimal,
dependency-free codecs for the formats the synthetic table uses:

- PNG:  real encoder (8-bit RGB, filter 0) + real decoder (filters 0-4),
        via zlib.  Enough for bit-exact round-trips and corruption checks.
- BMP:  real encoder/decoder (24bpp, bottom-up, BI_RGB).
- JPEG: REAL baseline sequential codec (functions/jpeg.py — ITU T.81
        DCT + Annex-K quant/Huffman tables, byte stuffing, JFIF): the
        engine's lossy format, so the PSNR>=40dB round-trip invariant
        exercises genuine quantization loss.  ``decode_jpeg_batch``
        vectorizes the entropy pass across a whole batch of streams
        (the DecodeValidator hot path); ``jpeg_roundtrip`` skips the
        bijective Huffman stage for a bit-identical round-trip at a
        fraction of the cost.

These play the role the reference's binary parser plays for protobuf
(/root/reference/src/Data/Katydid/Parser/Protobuf/Protobuf.hs:165-293):
"decode opaque bytes into a structured value, tolerating malformed input by
reporting an error rather than crashing".
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
BMP_MAGIC = b"BM"
JPEG_MAGIC = b"\xff\xd8\xff"

# encode quality for the engine's jpeg writes: highest IJG step whose
# worst-case round-trip PSNR over the adversarial sawtooth fixture still
# clears the 40 dB gate with margin (measured 43.2 dB; q95 measured 35.3)
JPEG_QUALITY = 98


class DecodeError(ValueError):
    """Raised when image bytes cannot be decoded."""


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(tag + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", crc)


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """Encode an (h, w, 3) uint8 array as an 8-bit RGB PNG (filter type 0)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    h, w, _ = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # one filter byte (0 = None) per scanline, vectorized
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = arr.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_, pb, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit RGB PNG (filters 0-4) into an (h, w, 3) uint8 array."""
    if not data.startswith(PNG_MAGIC):
        raise DecodeError("bad PNG magic")
    pos, ihdr, idat = len(PNG_MAGIC), None, []
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise DecodeError("truncated PNG chunk")
        crc_bytes = data[pos + 8 + length : pos + 12 + length]
        if len(crc_bytes) != 4:
            raise DecodeError("truncated PNG crc")
        if zlib.crc32(tag + body) & 0xFFFFFFFF != struct.unpack(">I", crc_bytes)[0]:
            raise DecodeError("bad PNG chunk crc")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise DecodeError("missing PNG chunks")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or ctype != 2 or comp != 0 or filt != 0 or interlace != 0:
        raise DecodeError("unsupported PNG variant")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:  # corrupt deflate stream
        raise DecodeError(f"bad PNG deflate: {e}") from e
    stride = 1 + w * 3
    if len(raw) != stride * h:
        raise DecodeError("bad PNG payload size")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    filters = rows[:, 0]
    if not filters.any():  # all filter 0 (our encoder's output): zero-copy slice
        return rows[:, 1:].reshape(h, w, 3).copy()
    out = np.zeros((h, w * 3), dtype=np.uint8)
    bpp = 3
    for y in range(h):
        f = filters[y]
        cur = rows[y, 1:].copy()
        prev = out[y - 1] if y > 0 else np.zeros(w * 3, dtype=np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 2:  # Up
            out[y] = cur + prev
        elif f == 1:  # Sub — sequential in x, vectorize over channels
            line = cur
            for x in range(bpp, w * 3):
                line[x] = (int(line[x]) + int(line[x - bpp])) & 0xFF
            out[y] = line
        elif f == 3:  # Average
            line = cur
            for x in range(w * 3):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
            out[y] = line
        elif f == 4:  # Paeth
            line = cur
            for x in range(w * 3):
                left = line[x - bpp] if x >= bpp else np.uint8(0)
                ul = prev[x - bpp] if x >= bpp else np.uint8(0)
                pred = _paeth(
                    np.asarray(left), np.asarray(prev[x]), np.asarray(ul)
                )
                line[x] = (int(line[x]) + int(pred)) & 0xFF
            out[y] = line
        else:
            raise DecodeError(f"bad PNG filter {f}")
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# BMP (24bpp BI_RGB, bottom-up)
# ---------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w, _ = arr.shape
    pad = (-(w * 3)) % 4
    stride = w * 3 + pad
    img_size = stride * h
    # pixel rows: bottom-up, BGR, padded
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    file_header = struct.pack("<2sIHHI", BMP_MAGIC, 14 + 40 + img_size, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return file_header + info_header + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    if not data.startswith(BMP_MAGIC):
        raise DecodeError("bad BMP magic")
    if len(data) < 54:
        raise DecodeError("truncated BMP header")
    offset = struct.unpack_from("<I", data, 10)[0]
    hsize, w, h, planes, bpp = struct.unpack_from("<IiiHH", data, 14)
    if hsize != 40 or planes != 1 or bpp != 24 or w <= 0 or h <= 0:
        raise DecodeError("unsupported BMP variant")
    pad = (-(w * 3)) % 4
    stride = w * 3 + pad
    need = offset + stride * h
    if len(data) < need:
        raise DecodeError("truncated BMP payload")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1].copy()  # bottom-up BGR -> top-down RGB


# ---------------------------------------------------------------------------
# JPEG — real baseline sequential codec (functions/jpeg.py)
# ---------------------------------------------------------------------------


def encode_jpeg(arr: np.ndarray, quality: int = JPEG_QUALITY) -> bytes:
    """(h, w, 3) uint8 -> baseline JFIF bytes (4:4:4, Annex-K tables)."""
    from katydid_haskell_ray.functions import jpeg as _J
    return _J.encode_baseline(arr, quality=quality)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8; DecodeError on corrupt or
    non-baseline (progressive/arithmetic/subsampled) streams."""
    from katydid_haskell_ray.functions import jpeg as _J
    try:
        return _J.decode_baseline(data)
    except _J.JpegError as e:
        raise DecodeError(str(e)) from e


def decode_jpeg_batch(datas: list) -> list:
    """Decode many jpegs with the SIMD-across-streams entropy pass; each
    slot is an ndarray or a DecodeError (per-row verdicts, never a batch
    failure) — the DecodeValidator fast path."""
    from katydid_haskell_ray.functions import jpeg as _J
    out = _J.decode_baseline_batch(datas, errors="return")
    return [DecodeError(str(r)) if isinstance(r, Exception) else r
            for r in out]


def jpeg_roundtrip(arr: np.ndarray, quality: int = JPEG_QUALITY) -> np.ndarray:
    """decode(encode(arr)) pixels without the bijective entropy stage —
    bit-identical (tested) and ~20x cheaper; the PSNR round-trip check's
    hot path."""
    from katydid_haskell_ray.functions import jpeg as _J
    return _J.lossy_roundtrip(arr, quality=quality)


def jpeg_roundtrip_batch(arrs: list, quality: int = JPEG_QUALITY) -> list:
    """:func:`jpeg_roundtrip` for many images in one DCT pass."""
    from katydid_haskell_ray.functions import jpeg as _J
    return _J.lossy_roundtrip_batch(arrs, quality=quality)


# ---------------------------------------------------------------------------
# dispatch + checks
# ---------------------------------------------------------------------------

ENCODERS = {"png": encode_png, "bmp": encode_bmp, "jpeg": encode_jpeg}
DECODERS = {"png": decode_png, "bmp": decode_bmp, "jpeg": decode_jpeg}
LOSSY_FMTS = {"jpeg"}


def sniff_format(data: bytes) -> str | None:
    """Return the format implied by magic bytes, or None if unrecognized."""
    if data.startswith(PNG_MAGIC):
        return "png"
    if data.startswith(BMP_MAGIC):
        return "bmp"
    if data.startswith(JPEG_MAGIC):
        return "jpeg"
    return None


def decode_image(data: bytes, fmt: str | None = None) -> np.ndarray:
    """Decode image bytes; if fmt is None, sniff from magic bytes."""
    f = fmt or sniff_format(data)
    if f is None or f not in DECODERS:
        raise DecodeError(f"unknown image format {f!r}")
    return DECODERS[f](data)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 * 255.0 / mse))


def phash64(arr: np.ndarray) -> int:
    """64-bit average-hash perceptual fingerprint (signed int64).

    Grayscale -> 8x8 block means -> bit per cell (mean-of-means threshold).
    Deterministic and vectorized; used both by the synthesizer (ground truth
    column) and the decode-validation stage (recompute + compare).
    """
    h, w = arr.shape[:2]
    if h < 8 or w < 8:  # tiny images: upsample so every 8x8 cell is non-empty
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(8) * w) // 8
        arr = arr[ys][:, xs]
    a = arr.astype(np.float64)
    # explicit elementwise weights (NOT @): BLAS matmul rounding differs by
    # operand shape, which would break batch-vs-single bit-identity on tie
    # cells (constant images)
    gray = a[..., 0] * 0.299 + a[..., 1] * 0.587 + a[..., 2] * 0.114
    h, w = gray.shape
    # resample to 8x8 via index-based block means (works for any h, w >= 8);
    # block sums via reduceat on both axes (vectorized)
    ys = (np.arange(8 + 1) * h) // 8
    xs = (np.arange(8 + 1) * w) // 8
    rows = np.add.reduceat(gray, ys[:-1], axis=0)
    sums = np.add.reduceat(rows, xs[:-1], axis=1)
    areas = np.outer(np.diff(ys), np.diff(xs)).astype(np.float64)
    cells = sums / areas
    bits = (cells > cells.mean()).astype(np.uint64).ravel()
    shifts = np.arange(63, -1, -1, dtype=np.uint64)
    val = np.bitwise_or.reduce(bits << shifts)
    return int(val.astype(np.int64))  # reinterpret as signed for Arrow int64


_PHASH_W = np.array([0.299, 0.587, 0.114])


def phash64_batch(arrs: np.ndarray) -> np.ndarray:
    """Vectorized phash64 over a stack of SAME-SIZE images (n, h, w, 3).

    Bit-identical to per-image :func:`phash64` (same reduceat/mean float
    ops, just batched); callers group images by (h, w) first."""
    n, h, w, _ = arrs.shape
    if h < 8 or w < 8:  # tiny images: same upsampling as phash64
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(8) * w) // 8
        arrs = arrs[:, ys][:, :, xs]
        n, h, w, _ = arrs.shape
    af = arrs.astype(np.float64)
    gray = af[..., 0] * 0.299 + af[..., 1] * 0.587 + af[..., 2] * 0.114
    ys = (np.arange(8 + 1) * h) // 8
    xs = (np.arange(8 + 1) * w) // 8
    rows = np.add.reduceat(gray, ys[:-1], axis=1)
    sums = np.add.reduceat(rows, xs[:-1], axis=2)  # (n, 8, 8)
    areas = np.outer(np.diff(ys), np.diff(xs)).astype(np.float64)
    cells = sums / areas
    bits = (cells > cells.mean(axis=(1, 2), keepdims=True))
    flat = bits.reshape(n, 64).astype(np.uint64)
    shifts = np.arange(63, -1, -1, dtype=np.uint64)
    vals = np.bitwise_or.reduce(flat << shifts, axis=1)
    return vals.astype(np.int64)
