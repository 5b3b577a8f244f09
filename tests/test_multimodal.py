"""Multimodal binary-column plumbing (decode stubbed, plumbing real)."""

import hashlib

import pytest

from featureform_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    deterministic_fake_decoder,
    extract_media_features,
    frame_sample_plan,
    real_decoder,
)


def media_df(spark):
    rows = [
        (0, b"\x89PNG fake image bytes", "image", {"src": "cam1"}),
        (1, b"RIFF fake audio bytes padded", "audio", {"src": "mic"}),
        (2, b"\x00\x00\x01\xba fake video" * 300, "video", {}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_real_decoder_decodes_uncompressed_and_gates_compressed():
    """real_decoder genuinely parses uncompressed formats (round 2,
    functions/media_codecs.py) and keeps the honest NotImplementedError
    gate for compressed ones (no PIL/ffmpeg in this container)."""
    from featureform_spark.functions.media_codecs import synth_bmp

    assert real_decoder(synth_bmp(24, 18, 5), "image") == (24, 18)
    with pytest.raises(NotImplementedError):
        real_decoder(b"\x89PNG\r\n\x1a\nrest", "image")
    with pytest.raises(ValueError):
        real_decoder(b"x", "image")


def test_extract_features_fake_decoder(spark):
    df = media_df(spark)
    out = {r["media_id"]: r for r in
           extract_media_features(df, deterministic_fake_decoder).collect()}
    assert out[0]["n_bytes"] == len(b"\x89PNG fake image bytes")
    assert out[0]["content_hash"] == hashlib.md5(b"\x89PNG fake image bytes").hexdigest()
    # fake decoder is deterministic: same content → same dims across runs
    w, h = deterministic_fake_decoder(b"\x89PNG fake image bytes", "image")
    assert (out[0]["width"], out[0]["height"]) == (w, h)
    assert 0.0 < out[1]["byte_mean"] < 255.0


def test_resize_media_plumbing(spark):
    from featureform_spark.functions.multimodal import (
        deterministic_fake_resizer,
        resize_media,
    )

    df = media_df(spark)
    out = {r["media_id"]: r for r in resize_media(df, 32, 32).collect()}
    assert set(out) == {0, 1, 2}
    for mid, row in out.items():
        assert len(row["content"]) == (32 * 32) // 64
        assert row["metadata"]["width"] == "32"
        assert row["metadata"]["height"] == "32"
    # deterministic: same input bytes → same resized bytes
    assert out[0]["content"] == deterministic_fake_resizer(
        b"\x89PNG fake image bytes", "image", 32, 32
    )
    # original metadata keys survive the rewrite
    assert out[0]["metadata"]["src"] == "cam1"
    # stages compose: resized table feeds the feature extractor unchanged
    feats = extract_media_features(
        resize_media(df, 32, 32), deterministic_fake_decoder
    ).collect()
    assert {r["media_id"] for r in feats} == {0, 1, 2}
    assert all(r["n_bytes"] == 16 for r in feats)


def test_frame_sample_plan_explodes(spark):
    df = media_df(spark)
    frames = frame_sample_plan(df, every_n=2).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_index"])
    assert by_id[0] == [0]                       # tiny file → 1 frame
    assert by_id[2][0] == 0 and len(by_id[2]) > 1  # video → multiple sampled frames
    assert all(i % 2 == 0 for i in by_id[2])
