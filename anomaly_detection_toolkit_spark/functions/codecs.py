"""Self-contained, deterministic image codecs (numpy + stdlib only).

The target environment has no Pillow/libjpeg, so the engine ships its
own codecs for the north-star image table (BASELINE input_hint:
``bytes BINARY`` + ``fmt STRING``):

- ``raw``    : magic + little-endian (w, h, c) + raw uint8 pixels
- ``ppm``    : binary P6 (public Netpbm format)
- ``bmp``    : 24-bit uncompressed BMP (BGR, bottom-up, 4-byte row pad)
- ``png``    : real PNG (RFC 2083), 8-bit RGB truecolor, non-interlaced
  — stdlib zlib inflate/deflate + all five row filters (None/Sub/Up/
  Average/Paeth) implemented with numpy. The encoder emits filter-0
  rows; the decoder accepts any spec-conforming filter sequence and
  multiple IDAT chunks, and verifies chunk CRCs.
- ``lossyq`` : deterministic lossy codec — 6-bit/channel quantization
  + zlib. Midpoint dequantization bounds per-channel error to ±2
  (MSE ≤ ~1.7 → PSNR ≥ ~45 dB), so the PSNR≥40dB payload invariant is
  meaningfully testable without libjpeg.

All functions are pure (ndarray in / bytes out) so they can run inside
Arrow-batched pandas UDFs / ``mapInPandas`` with zero per-row Python
at the Spark layer. Decode failures raise ``CodecError`` — the payload
check catches it per row and emits a violation instead of failing the
job.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC_RAW = b"ADTR"
MAGIC_LSQ = b"ADTQ"

FORMATS = ("raw", "ppm", "bmp", "png", "lossyq")

PNG_SIG = b"\x89PNG\r\n\x1a\n"


class CodecError(ValueError):
    """Raised when bytes cannot be decoded as the claimed format."""


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------


def encode_raw(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    return MAGIC_RAW + struct.pack("<HHB", w, h, c) + img.astype(np.uint8).tobytes()


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    if c != 3:
        raise CodecError("ppm requires 3 channels")
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    if c != 3:
        raise CodecError("bmp requires 3 channels")
    row_size = (w * 3 + 3) & ~3
    data_size = row_size * h
    # BGR, bottom-up, padded rows
    bgr = img[::-1, :, ::-1].astype(np.uint8)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM",
        54 + data_size,
        0,
        0,
        54,
        40,
        w,
        h,
        1,
        24,
        0,
        data_size,
        2835,
        2835,
        0,
        0,
    )
    return header + rows.tobytes()


def encode_lossyq(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    q = (img.astype(np.uint8) >> 2).astype(np.uint8)  # 6-bit quantization
    payload = zlib.compress(q.tobytes(), level=6)
    return MAGIC_LSQ + struct.pack("<HHB", w, h, c) + payload


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """8-bit RGB truecolor, non-interlaced, filter-0 rows."""
    h, w, c = img.shape
    if c != 3:
        raise CodecError("png codec supports 8-bit RGB only")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)  # filter byte 0 per row
    raw[:, 1:] = img.astype(np.uint8).reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level=6)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


_ENCODERS = {
    "raw": encode_raw,
    "ppm": encode_ppm,
    "bmp": encode_bmp,
    "png": encode_png,
    "lossyq": encode_lossyq,
}


def encode(img: np.ndarray, fmt: str) -> bytes:
    try:
        enc = _ENCODERS[fmt]
    except KeyError:
        raise CodecError(f"unknown format {fmt!r}") from None
    return enc(img)


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------


def decode_raw(buf: bytes) -> np.ndarray:
    if len(buf) < 9 or buf[:4] != MAGIC_RAW:
        raise CodecError("bad raw magic")
    w, h, c = struct.unpack("<HHB", buf[4:9])
    body = np.frombuffer(buf, dtype=np.uint8, offset=9)
    if body.size != w * h * c:
        raise CodecError(f"raw size mismatch: {body.size} != {w * h * c}")
    return body.reshape(h, w, c)


def decode_ppm(buf: bytes) -> np.ndarray:
    if buf[:2] != b"P6":
        raise CodecError("bad ppm magic")
    parts = buf.split(b"\n", 3)
    if len(parts) < 4:
        raise CodecError("truncated ppm header")
    try:
        w, h = (int(x) for x in parts[1].split())
        maxval = int(parts[2])
    except ValueError as e:
        raise CodecError(f"bad ppm header: {e}") from None
    if maxval != 255:
        raise CodecError("only 8-bit ppm supported")
    body = np.frombuffer(parts[3], dtype=np.uint8)
    if body.size != w * h * 3:
        raise CodecError(f"ppm size mismatch: {body.size} != {w * h * 3}")
    return body.reshape(h, w, 3)


def decode_bmp(buf: bytes) -> np.ndarray:
    if buf[:2] != b"BM" or len(buf) < 54:
        raise CodecError("bad bmp magic")
    offset = struct.unpack("<I", buf[10:14])[0]
    w, h = struct.unpack("<ii", buf[18:26])
    bpp = struct.unpack("<H", buf[28:30])[0]
    if bpp != 24 or h <= 0 or w <= 0:
        raise CodecError(f"unsupported bmp (bpp={bpp}, w={w}, h={h})")
    row_size = (w * 3 + 3) & ~3
    body = np.frombuffer(buf, dtype=np.uint8, offset=offset)
    if body.size < row_size * h:
        raise CodecError("truncated bmp body")
    rows = body[: row_size * h].reshape(h, row_size)[:, : w * 3]
    bgr = rows.reshape(h, w, 3)[::-1]
    return bgr[:, :, ::-1].copy()


def decode_lossyq(buf: bytes) -> np.ndarray:
    if len(buf) < 9 or buf[:4] != MAGIC_LSQ:
        raise CodecError("bad lossyq magic")
    w, h, c = struct.unpack("<HHB", buf[4:9])
    try:
        body = np.frombuffer(zlib.decompress(buf[9:]), dtype=np.uint8)
    except zlib.error as e:
        raise CodecError(f"lossyq zlib: {e}") from None
    if body.size != w * h * c:
        raise CodecError(f"lossyq size mismatch: {body.size} != {w * h * c}")
    # midpoint dequantization: error ∈ [-2, +1] per channel
    return ((body.reshape(h, w, c).astype(np.uint8) << 2) | 2).astype(np.uint8)


def _png_unfilter(data: bytes, w: int, h: int) -> np.ndarray:
    """Reverse the per-row filters (PNG spec §6). Sub is a per-channel
    modular cumsum and Up a vectorized add; Average/Paeth recurse on
    the previous pixel so they scan x with 3-wide vector ops."""
    stride = w * 3
    if len(data) != h * (stride + 1):
        raise CodecError(
            f"png data size mismatch: {len(data)} != {h * (stride + 1)}"
        )
    arr = np.frombuffer(data, dtype=np.uint8).reshape(h, stride + 1)
    filters = arr[:, 0]
    rows = arr[:, 1:]
    if not filters.any():  # all filter-0 (what encode_png emits):
        return rows.reshape(h, w, 3).copy()  # pure reshape, no row loop
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        row = rows[y]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:  # None
            out[y] = row
        elif f == 1:  # Sub: recon[x] = raw[x] + recon[x-3]
            out[y] = (
                row.reshape(w, 3).astype(np.uint64).cumsum(axis=0) % 256
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up
            out[y] = row + prev  # uint8 wraps mod 256
        elif f == 3:  # Average
            r = out[y]
            up = prev.reshape(w, 3).astype(np.uint16)
            rw = row.reshape(w, 3).astype(np.uint16)
            left = np.zeros(3, dtype=np.uint16)
            rv = r.reshape(w, 3)
            for x in range(w):
                left = (rw[x] + ((left + up[x]) >> 1)) & 0xFF
                rv[x] = left
        elif f == 4:  # Paeth
            r = out[y]
            up = prev.reshape(w, 3).astype(np.int16)
            rw = row.reshape(w, 3).astype(np.int16)
            rv = r.reshape(w, 3)
            left = np.zeros(3, dtype=np.int16)
            ul = np.zeros(3, dtype=np.int16)
            for x in range(w):
                p = left + up[x] - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - up[x]), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up[x], ul)
                )
                left = (rw[x] + pred) & 0xFF
                rv[x] = left
                ul = up[x]
        else:
            raise CodecError(f"bad png filter {f}")
    return out.reshape(h, w, 3)


def decode_png(buf: bytes) -> np.ndarray:
    if buf[:8] != PNG_SIG:
        raise CodecError("bad png signature")
    pos = 8
    ihdr: tuple | None = None
    idat = bytearray()
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(buf):
            raise CodecError("truncated png chunk")
        (crc,) = struct.unpack(">I", buf[pos + 8 + length : pos + 12 + length])
        if crc != zlib.crc32(tag + data) & 0xFFFFFFFF:
            raise CodecError(f"png crc mismatch in {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise CodecError("png missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise CodecError(
            "only 8-bit RGB non-interlaced png supported "
            f"(depth={depth}, color={ctype}, interlace={interlace})"
        )
    try:
        data = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise CodecError(f"png zlib: {e}") from None
    return _png_unfilter(data, w, h)


_DECODERS = {
    "raw": decode_raw,
    "ppm": decode_ppm,
    "bmp": decode_bmp,
    "png": decode_png,
    "lossyq": decode_lossyq,
}


def decode(buf: bytes | bytearray | memoryview | None, fmt: str) -> np.ndarray:
    if buf is None:
        raise CodecError("null payload")
    try:
        dec = _DECODERS[fmt]
    except KeyError:
        raise CodecError(f"unknown format {fmt!r}") from None
    return dec(bytes(buf))


LOSSLESS = frozenset({"raw", "ppm", "bmp", "png"})


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    if a.shape != b.shape:
        return float("-inf")
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def phash64(img: np.ndarray) -> int:
    """Deterministic 64-bit perceptual-style hash of decoded pixels.

    Grayscale → 8×8 block-mean downsample → threshold at the mean →
    pack 64 bits into a signed int64 (two's complement).
    """
    gray = img.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    ye = np.append(ys[1:], h)
    xe = np.append(xs[1:], w)
    blocks = np.empty((8, 8), dtype=np.float64)
    for i in range(8):
        for j in range(8):
            blocks[i, j] = gray[ys[i] : ye[i], xs[j] : xe[j]].mean()
    bits = (blocks > blocks.mean()).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    if val >= 1 << 63:
        val -= 1 << 64
    return val
