"""Self-contained, deterministic image codecs (numpy + stdlib only).

The target environment has no Pillow/libjpeg, so the engine ships its
own codecs for the north-star image table (BASELINE input_hint:
``bytes BINARY`` + ``fmt STRING``):

- ``raw``    : magic + little-endian (w, h, c) + raw uint8 pixels
- ``ppm``    : binary P6 (public Netpbm format)
- ``bmp``    : 24-bit uncompressed BMP (BGR, bottom-up, 4-byte row pad)
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

FORMATS = ("raw", "ppm", "bmp", "lossyq")


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


_ENCODERS = {
    "raw": encode_raw,
    "ppm": encode_ppm,
    "bmp": encode_bmp,
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


_DECODERS = {
    "raw": decode_raw,
    "ppm": decode_ppm,
    "bmp": decode_bmp,
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


LOSSLESS = frozenset({"raw", "ppm", "bmp"})


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
