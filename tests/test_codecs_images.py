"""Codec round-trips + synthetic image table generation (FIXTURES F1)."""

from __future__ import annotations

import numpy as np
import pytest

from anomaly_detection_toolkit_spark.functions import codecs
from anomaly_detection_toolkit_spark.sources import images


@pytest.fixture(scope="module")
def img():
    return images.gen_pixels(7, 48, 32)


@pytest.mark.parametrize("fmt", codecs.FORMATS)
def test_roundtrip(img, fmt):
    buf = codecs.encode(img, fmt)
    out = codecs.decode(buf, fmt)
    assert out.shape == img.shape
    if fmt in codecs.LOSSLESS:
        np.testing.assert_array_equal(out, img)
    else:
        assert codecs.psnr(img, out) >= 40.0  # BASELINE payload invariant


def test_decode_errors(img):
    with pytest.raises(codecs.CodecError):
        codecs.decode(None, "raw")
    with pytest.raises(codecs.CodecError):
        codecs.decode(b"XXjunk", "raw")
    with pytest.raises(codecs.CodecError):
        codecs.decode(codecs.encode(img, "raw")[:-5], "raw")
    with pytest.raises(codecs.CodecError):
        codecs.decode(codecs.encode(img, "bmp"), "ppm")
    with pytest.raises(codecs.CodecError):
        codecs.decode(b"XX" + codecs.encode(img, "lossyq")[2:], "lossyq")


def test_gen_pixels_reference_hashes():
    """Pin the EXACT reference-pixel bytes. The payload check, the
    cached bench tables, and the multimodal serial-replay oracle all
    assume gen_pixels is a stable pure function of (seed, i, w, h) —
    any implementation change (however "equivalent" the float math
    looks) must reproduce these md5s bit-for-bit or the whole
    downstream evidence chain silently diverges."""
    import hashlib

    expect = {
        (0, 32, 32): "f81771494ef08165f1d4feca5d4145cd",
        (7, 48, 32): "e3db8519d035ff3faaf3f40f59461177",
        (123, 64, 48): "a9496bb1dd6775398ed06f7a54d971dc",
        (999983, 96, 128): "7e493122ec735e4507ffc8c5ff33e455",
        (2147483647, 128, 96): "bf1b5780e1837f50c4cb34c26b1587ac",
    }
    for (i, w, h), e in expect.items():
        got = hashlib.md5(images.gen_pixels(i, w, h).tobytes()).hexdigest()
        assert got == e, f"gen_pixels({i},{w},{h}) drifted: {got}"


def test_phash_deterministic_and_content_sensitive():
    a = images.gen_pixels(1, 64, 64)
    b = images.gen_pixels(2, 64, 64)
    assert codecs.phash64(a) == codecs.phash64(a.copy())
    assert codecs.phash64(a) != codecs.phash64(b)
    v = codecs.phash64(a)
    assert -(1 << 63) <= v < (1 << 63)  # fits BIGINT


def test_generate_images_deterministic(spark):
    df1 = images.generate_images(spark, 500, n_parts=4).toPandas()
    df2 = images.generate_images(spark, 500, n_parts=4).toPandas()
    assert len(df1) == 500
    s1 = df1.sort_values("image_id").reset_index(drop=True)
    s2 = df2.sort_values("image_id").reset_index(drop=True)
    assert s1.drop(columns=["bytes"]).equals(s2.drop(columns=["bytes"]))
    assert all(
        (a is None and b is None) or a == b for a, b in zip(s1["bytes"], s2["bytes"])
    )


def test_generate_images_defects_present(spark):
    pdf = images.generate_images(spark, 2000, n_parts=8).toPandas()
    kinds = set(pdf["defect"].dropna().unique())
    assert {
        "hot_phash",
        "dup_image_id",
        "orphan_caption",
        "corrupt_bytes",
        "null_bytes",
        "null_dims",
        "caption_bad",
        "drift",
    } <= kinds
    # hot phash bucket is a real duplicate-key skew source
    hot = pdf[pdf["phash"] == images.HOT_PHASH]
    assert len(hot) > 3
    # duplicate image_ids exist
    assert pdf["image_id"].duplicated().any()
    # clean config yields no defects
    clean = images.generate_images(spark, 500, n_parts=4, cfg=images.CLEAN).toPandas()
    assert clean["defect"].isna().all()
    assert not clean["image_id"].duplicated().any()


def test_payload_consistency_on_clean_rows(spark):
    pdf = images.generate_images(spark, 300, n_parts=4).toPandas()
    ok = pdf[pdf["defect"].isna()].head(20)
    for _, r in ok.iterrows():
        dec = codecs.decode(r["bytes"], r["fmt"])
        assert dec.shape == (r["h"], r["w"], 3)
        ref = images.gen_pixels(images.id_num(r["image_id"]), int(r["w"]), int(r["h"]))
        assert codecs.psnr(ref, dec) >= 40.0
        assert r["caption"] == images.caption_of(r["image_id"])


def _png_with_filters(img, filters):
    """Hand-build a PNG whose rows use the given filter types, so the
    decoder's unfilter paths (Sub/Up/Average/Paeth) are exercised —
    our encoder only emits filter 0."""
    import struct
    import zlib as _zlib

    h, w, _ = img.shape
    px = img.astype(np.int32)
    raw = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        raw.append(f)
        cur = px[y]
        prev = px[y - 1] if y else np.zeros_like(cur)
        left = np.zeros((w, 3), dtype=np.int32)
        left[1:] = cur[:-1]
        ul = np.zeros((w, 3), dtype=np.int32)
        ul[1:] = prev[:-1]
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((left + prev) >> 1)
        else:  # paeth
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = cur - pred
        raw.extend((filt % 256).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        codecs.PNG_SIG
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", _zlib.compress(bytes(raw)))
        + codecs._png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_decodes_all_filter_types(img, filters):
    buf = _png_with_filters(img, filters)
    np.testing.assert_array_equal(codecs.decode(buf, "png"), img)


def test_png_rejects_bad_crc_and_header(img):
    buf = bytearray(codecs.encode(img, "png"))
    buf[40] ^= 0xFF  # flip a byte inside IDAT -> CRC mismatch
    with pytest.raises(codecs.CodecError):
        codecs.decode(bytes(buf), "png")
    with pytest.raises(codecs.CodecError):
        codecs.decode(b"\x89PNG\r\n\x1a\njunk", "png")
    # grayscale / non-8-bit headers are refused, not misdecoded
    import struct
    import zlib as _zlib

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)  # color type 0
    gray = (
        codecs.PNG_SIG
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", _zlib.compress(b"\x00" * 20))
        + codecs._png_chunk(b"IEND", b"")
    )
    with pytest.raises(codecs.CodecError):
        codecs.decode(gray, "png")


def test_png_multiple_idat_chunks(img):
    import struct

    buf = codecs.encode(img, "png")
    # split the single IDAT into two chunks
    pos = 8
    parts = {}
    order = []
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        parts[tag] = buf[pos + 8 : pos + 8 + ln]
        order.append(tag)
        pos += 12 + ln
        if tag == b"IEND":
            break
    idat = parts[b"IDAT"]
    mid = len(idat) // 2
    rebuilt = (
        codecs.PNG_SIG
        + codecs._png_chunk(b"IHDR", parts[b"IHDR"])
        + codecs._png_chunk(b"IDAT", idat[:mid])
        + codecs._png_chunk(b"IDAT", idat[mid:])
        + codecs._png_chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(codecs.decode(rebuilt, "png"), img)
