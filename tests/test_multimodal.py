"""Multimodal operator tests: real image codecs, deterministic fake
audio/video codecs, stubbed real-container formats, and the
column-pruning contract (binary column only enters decode stages)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.functions import codecs
from anomaly_detection_toolkit_spark.operators import multimodal as mm


def _img(i, w=16, h=12):
    rng = np.random.default_rng(i)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def image_df(spark):
    rows = []
    for i in range(8):
        img = _img(i)
        fmt = ["raw", "ppm", "bmp", "lossyq"][i % 4]
        rows.append((f"img{i}", codecs.encode(img, fmt), fmt))
    rows.append(("bad", b"garbage", "ppm"))
    return spark.createDataFrame(rows, "id string, bytes binary, fmt string")


def test_image_features(image_df):
    out = {r.id: r for r in mm.image_features(image_df, "id", "bytes", "fmt").collect()}
    assert len(out) == 9
    ok = [r for r in out.values() if r.ok]
    assert len(ok) == 8
    r0, img0 = out["img0"], _img(0)
    assert (r0.w, r0.h) == (16, 12)
    assert r0.mean_r == pytest.approx(float(img0[..., 0].mean()))
    assert not out["bad"].ok and out["bad"].err


def test_image_resize_roundtrip(image_df):
    out = {
        r.id: r
        for r in mm.image_resize(image_df, "id", "bytes", "fmt", 8, 6).collect()
    }
    good = out["img1"]  # ppm (lossless)
    assert good.ok and (good.w, good.h) == (8, 6)
    thumb = codecs.decode(good.bytes, "ppm")
    want = mm._resize_box(_img(1), 8, 6)
    np.testing.assert_array_equal(thumb, want)
    assert not out["bad"].ok


def test_audio_features_fake_codec(spark):
    t = np.linspace(0, 1, 16000, endpoint=False)
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    rows = [
        ("a1", mm.encode_fake_pcm16(tone), "fake_pcm16"),
        ("a2", mm.encode_fake_pcm16(np.zeros(100)), "fake_pcm16"),
        ("a3", b"FPCMxxxx", "fake_pcm16"),  # truncated
        ("a4", b"whatever", "wav"),  # malformed RIFF
        ("a5", mm.encode_wav(tone), "wav"),  # real RIFF/WAVE PCM16
        ("a6", b"ID3\x03junk", "mp3"),  # still-stubbed format
    ]
    df = spark.createDataFrame(rows, "id string, bytes binary, fmt string")
    out = {r.id: r for r in mm.audio_features(df, "id", "bytes", "fmt").collect()}
    a1 = out["a1"]
    assert a1.ok and a1.rate == 16000 and a1.duration_s == pytest.approx(1.0)
    assert a1.rms == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
    assert a1.zcr == pytest.approx(2 * 440 / 16000, rel=0.01)
    assert out["a2"].ok and out["a2"].rms == 0.0
    assert not out["a3"].ok
    # malformed wav surfaces as a failed row, not a job abort
    assert not out["a4"].ok and "bad wav" in out["a4"].err
    # real RIFF wav decodes and matches the tone's statistics
    a5 = out["a5"]
    assert a5.ok and a5.rate == 16000 and a5.duration_s == pytest.approx(1.0)
    assert a5.rms == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
    assert a5.zcr == pytest.approx(2 * 440 / 16000, rel=0.01)
    # the mp3 stub path remains a failed row
    assert not out["a6"].ok and "external library" in out["a6"].err


def test_wav_roundtrip_and_mixdown():
    rng = np.random.default_rng(11)
    mono = rng.uniform(-0.9, 0.9, 4000)
    dec, rate = mm.decode_wav(mm.encode_wav(mono, rate=8000))
    assert rate == 8000
    np.testing.assert_allclose(dec, mono, atol=1.0 / 32767)
    # stereo mixes down to the channel mean
    stereo = np.stack([mono, -mono], axis=1)
    dec2, _ = mm.decode_wav(mm.encode_wav(stereo, rate=8000, channels=2))
    np.testing.assert_allclose(dec2, np.zeros_like(mono), atol=1.0 / 32767)
    # 8-bit PCM path: hand-build via the stdlib wave module
    import io
    import wave as _wave

    bio = io.BytesIO()
    with _wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(4000)
        u8 = np.clip(mono * 127.0 + 128.0, 0, 255).astype(np.uint8)
        wf.writeframes(u8.tobytes())
    dec3, rate3 = mm.decode_wav(bio.getvalue())
    assert rate3 == 4000
    np.testing.assert_allclose(dec3, mono, atol=1.5 / 127)


def test_video_frame_sampling(spark):
    frames = [_img(i, 8, 8) for i in range(6)]
    rows = [
        ("v1", mm.encode_fake_mjpeg(frames), "fake_mjpeg"),
        ("v2", b"nope", "mp4"),  # stubbed real container
    ]
    df = spark.createDataFrame(rows, "id string, bytes binary, fmt string")
    out = mm.video_frame_sample(df, "id", "bytes", "fmt", every=2).collect()
    v1 = sorted((r for r in out if r.id == "v1"), key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in v1] == [0, 2, 4]
    assert all(r.n_frames == 6 and r.ok for r in v1)
    np.testing.assert_array_equal(codecs.decode(v1[1].frame_bytes, "ppm"), frames[2])
    v2 = [r for r in out if r.id == "v2"]
    assert len(v2) == 1 and not v2[0].ok


def test_binary_column_pruned_from_non_decode_plan(image_df):
    """A metadata-only projection over the payload table must not
    read the binary column (column pruning / ReadSchema contract)."""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        image_df.write.mode("overwrite").parquet(d)
        spark = image_df.sparkSession
        meta = spark.read.parquet(d).select("id", "fmt")
        plan = meta._jdf.queryExecution().executedPlan().toString()
        assert "bytes" not in plan  # pruned at the scan


def test_resize_box_exact_average():
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    small = mm._resize_box(img, 2, 2)
    assert small.shape == (2, 2, 3)
    want = img.reshape(2, 2, 2, 2, 3).mean(axis=(1, 3)).round().astype(np.uint8)
    np.testing.assert_array_equal(small, want)


def test_clip_table_determinism_and_defect_branches(spark):
    """sources/clips.py: rows are pure in (seed, i); the planted
    residue-class defects reach every kernel error branch; the
    distributed generator agrees with the serial make_clip_row."""
    from anomaly_detection_toolkit_spark.sources import clips

    # serial purity: same (seed, i) → byte-identical payloads
    r1, r2 = clips.make_clip_row(12, seed=7), clips.make_clip_row(12, seed=7)
    assert r1["abytes"] == r2["abytes"] and r1["vbytes"] == r2["vbytes"]
    assert clips.make_clip_row(12, seed=8)["abytes"] != r1["abytes"]

    df = clips.generate_clips(spark, 40, seed=7, spark_partitions=4)
    got = {r.clip_id: r for r in df.collect()}
    assert len(got) == 40
    # clean wav / truncated / mp3 stub / NULL payload / fake_pcm16
    for i in (0, 5, 7, 9, 33):
        want = clips.make_clip_row(i, seed=7)
        row = got[want["clip_id"]]
        assert row.abytes == want["abytes"] and row.afmt == want["afmt"]
        assert row.vbytes == want["vbytes"] and row.vfmt == want["vfmt"]
    assert got["clip_000009"].abytes is None  # i%23==9 → NULL payload

    from anomaly_detection_toolkit_spark.operators import multimodal as mm

    feats = {r.id: r for r in mm.audio_features(df, "clip_id", "abytes", "afmt").collect()}
    assert not feats["clip_000005"].ok            # truncated wav
    assert not feats["clip_000007"].ok            # mp3 stub
    assert "external library" in feats["clip_000007"].err
    assert not feats["clip_000009"].ok            # NULL payload
    assert feats["clip_000003"].ok                # stereo wav mixdown
    assert feats["clip_000000"].ok and feats["clip_000000"].rate == 8000

    frames = mm.video_frame_sample(df, "clip_id", "vbytes", "vfmt", every=2)
    vrows = frames.collect()
    bad = {r.id for r in vrows if not r.ok}
    assert "clip_000004" in bad                   # corrupt magic
    assert "clip_000011" in bad                   # mp4 stub
    # 1→N fan-out: i%4 == 3 → 4 frames → 2 sampled rows
    assert sum(1 for r in vrows if r.id == "clip_000003") == 2
