"""Multimodal plumbing: schemas, batch shapes, deterministic stub decode."""

from pyspark.sql import functions as F

from rust_geo_booleanop_spark.operators import (
    image_features,
    resize_images,
    sample_audio_frames,
    sample_video_frames,
    synth_media,
)


def _docs(spark):
    return spark.createDataFrame(
        [(f"https://m.example/{i}",) for i in range(20)], "url string"
    )


def test_synth_media_schema_and_determinism(spark):
    docs = _docs(spark)
    m1 = synth_media(spark, docs).collect()
    m2 = synth_media(spark, docs).collect()
    assert {r.url: bytes(r.media) for r in m1} == {r.url: bytes(r.media) for r in m2}
    kinds = {r.kind for r in m1}
    assert kinds <= {"image", "audio"} and len(kinds) == 2
    for r in m1:
        if r.kind == "image":
            assert r.width and r.height and r.sample_rate is None
        else:
            assert r.sample_rate == 16000 and r.width is None


def test_image_features(spark):
    media = synth_media(spark, _docs(spark))
    feats = image_features(media).collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(feats) == n_images > 0
    for r in feats:
        assert 0.0 <= r.mean_pixel <= 255.0
        assert r.std_pixel >= 0.0
    # deterministic phash
    feats2 = {r.url: r.phash for r in image_features(media).collect()}
    assert feats2 == {r.url: r.phash for r in feats}


def test_resize_batch_shape(spark):
    media = synth_media(spark, _docs(spark))
    thumbs = resize_images(media, out_width=16, out_height=8).collect()
    assert all(len(bytes(r.thumb)) == 16 * 8 for r in thumbs)


def test_video_frame_sampling(spark):
    media = synth_media(spark, _docs(spark), kinds=("image", "audio", "video"))
    vids = media.filter(F.col("kind") == "video")
    n_vids = vids.count()
    assert n_vids > 0
    frames = sample_video_frames(media, every_ms=1000, max_frames=5).collect()
    per_url = {}
    for r in frames:
        per_url.setdefault(r.url, []).append(r)
        assert 0.0 <= r.mean_pixel <= 255.0
        assert r.ts_ms == r.frame_no * 1000
    assert len(per_url) == n_vids
    for url, rs in per_url.items():
        nos = [r.frame_no for r in rs]
        assert nos == sorted(nos) and len(nos) <= 5
        # frames of the same clip differ (per-frame decode salt)
        if len(rs) > 1:
            assert len({r.phash for r in rs}) > 1 or len({r.mean_pixel for r in rs}) > 1
    # deterministic
    again = {(r.url, r.frame_no): r.phash for r in
             sample_video_frames(media, every_ms=1000, max_frames=5).collect()}
    assert again == {(r.url, r.frame_no): r.phash for r in frames}


def test_audio_frame_sampling(spark):
    media = synth_media(spark, _docs(spark))
    frames = sample_audio_frames(media, frame_ms=100, max_frames=4).collect()
    assert len(frames) > 0
    per_url = {}
    for r in frames:
        per_url.setdefault(r.url, []).append(r.frame_no)
        assert r.rms >= 0.0 and r.peak >= 0
    for url, nos in per_url.items():
        assert nos == sorted(nos) and len(nos) <= 4
