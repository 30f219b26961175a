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
