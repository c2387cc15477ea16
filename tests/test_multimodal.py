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


class TestCodecSeam:
    """The decode seam is real as of round 3: media payloads are genuine
    PNG/WAV containers and the extractors parse them. These tests pin the
    codec contract a Pillow/soundfile drop-in must reproduce."""

    def test_png_roundtrip_exact(self):
        import numpy as np

        from rust_geo_booleanop_spark.functions.codecs import (
            decode_png_gray8,
            encode_png_gray8,
        )

        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, size=(37, 53), dtype=np.uint8)
        assert (decode_png_gray8(encode_png_gray8(img)) == img).all()

    def test_png_decoder_handles_all_filter_types(self):
        """A foreign encoder may emit Sub/Up/Average/Paeth scanlines; build
        one PNG per filter type by hand and check exact reconstruction."""
        import struct
        import zlib

        import numpy as np

        from rust_geo_booleanop_spark.functions.codecs import decode_png_gray8

        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, size=(6, 9), dtype=np.uint8)

        def encode_with_filter(img, ft):
            h, w = img.shape
            rows = []
            prev = np.zeros(w, dtype=np.uint8)
            for y in range(h):
                cur = img[y]
                if ft == 0:
                    filt = cur.copy()
                elif ft == 1:  # Sub
                    filt = cur.copy()
                    filt[1:] = (cur[1:].astype(int) - cur[:-1].astype(int)) % 256
                elif ft == 2:  # Up
                    filt = ((cur.astype(int) - prev.astype(int)) % 256).astype(np.uint8)
                elif ft == 3:  # Average
                    filt = np.empty(w, dtype=np.uint8)
                    for x in range(w):
                        left = int(cur[x - 1]) if x else 0
                        filt[x] = (int(cur[x]) - (left + int(prev[x])) // 2) % 256
                else:  # Paeth
                    filt = np.empty(w, dtype=np.uint8)
                    for x in range(w):
                        a = int(cur[x - 1]) if x else 0
                        b = int(prev[x])
                        c = int(prev[x - 1]) if x else 0
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                        filt[x] = (int(cur[x]) - pred) % 256
                rows.append(bytes([ft]) + filt.astype(np.uint8).tobytes())
                prev = cur
            raw = b"".join(rows)

            def chunk(typ, data):
                return (
                    struct.pack(">I", len(data)) + typ + data
                    + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
                )

            ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
            return (
                b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
            )

        for ft in range(5):
            got = decode_png_gray8(encode_with_filter(img, ft))
            assert (got == img).all(), f"filter {ft}"

    def test_wav_roundtrip_exact(self):
        import numpy as np

        from rust_geo_booleanop_spark.functions.codecs import (
            decode_wav_pcm16,
            encode_wav_pcm16,
        )

        rng = np.random.RandomState(5)
        samples = rng.randint(-32768, 32768, size=4321, dtype=np.int16)
        got, sr = decode_wav_pcm16(encode_wav_pcm16(samples, 16000))
        assert sr == 16000
        assert (got == samples).all()

    def test_mpng_roundtrip_exact(self):
        import numpy as np

        from rust_geo_booleanop_spark.functions.codecs import (
            decode_mpng_frame,
            encode_mpng,
            mpng_info,
        )

        rng = np.random.RandomState(23)
        frames = [
            rng.randint(0, 256, size=(17, 29), dtype=np.uint8) for _ in range(4)
        ]
        payload = encode_mpng(frames, 500)
        assert mpng_info(payload) == (4, 500)
        for i, f in enumerate(frames):
            assert (decode_mpng_frame(payload, i) == f).all(), f"frame {i}"
        import pytest as _pytest

        with _pytest.raises(IndexError):
            decode_mpng_frame(payload, 4)

    def test_video_decode_seam_and_excerpt_clamp(self):
        """_decode_video_frame seeks by timestamp and clamps timestamps
        past the stored excerpt to the last keyframe."""
        import numpy as np

        from rust_geo_booleanop_spark.functions.codecs import encode_mpng
        from rust_geo_booleanop_spark.operators.multimodal import (
            _decode_video_frame,
        )

        rng = np.random.RandomState(3)
        frames = [
            rng.randint(0, 256, size=(8, 8), dtype=np.uint8) for _ in range(3)
        ]
        payload = encode_mpng(frames, 1000)
        assert (_decode_video_frame(payload, 0) == frames[0]).all()
        assert (_decode_video_frame(payload, 999) == frames[0]).all()
        assert (_decode_video_frame(payload, 1000) == frames[1]).all()
        assert (_decode_video_frame(payload, 2500) == frames[2]).all()
        # past the excerpt: clamp to last keyframe, never IndexError
        assert (_decode_video_frame(payload, 60_000) == frames[2]).all()

    def test_video_payload_frames_golden(self, spark):
        """Per-frame golden mirroring the m01 PNG tests: the MPNG payload
        decodes to EXACTLY the (content, frame_no)-derived keyframes, and
        sample_video_frames' features equal a local decode of the same
        container."""
        import hashlib

        import numpy as np

        from rust_geo_booleanop_spark.functions.codecs import (
            decode_mpng_frame,
            mpng_info,
        )
        from rust_geo_booleanop_spark.operators import synth_media
        from rust_geo_booleanop_spark.operators.multimodal import (
            _tile_content,
            _video_frame_content,
        )

        docs = spark.createDataFrame(
            [(f"https://vid.example/{i}",) for i in range(30)], "url string"
        )
        media = synth_media(spark, docs, kinds=("image", "audio", "video"))
        vids = media.filter(F.col("kind") == "video").collect()
        assert len(vids) > 0
        for r in vids:
            assert r.codec == "mpng"
            payload = bytes(r.media)
            n_frames, interval = mpng_info(payload)
            assert interval == 1000 and 1 <= n_frames <= 8
            content = hashlib.blake2b(
                r.url.encode(), digest_size=32, person=b"media"
            ).digest() * 8
            for fi in range(n_frames):
                expect = _tile_content(
                    _video_frame_content(content, fi), r.width * r.height
                ).reshape(r.height, r.width)
                assert (decode_mpng_frame(payload, fi) == expect).all(), (
                    f"{r.url} frame {fi}"
                )
        # operator features == local decode of the same containers
        got = {
            (r.url, r.frame_no): (r.ts_ms, r.mean_pixel)
            for r in sample_video_frames(media, every_ms=1000, max_frames=8).collect()
        }
        for r in vids:
            payload = bytes(r.media)
            n_frames, _ = mpng_info(payload)
            n_sampled = min(8, max(1, r.duration_ms // 1000))
            for fi in range(n_sampled):
                img = decode_mpng_frame(payload, min(n_frames - 1, fi))
                assert got[(r.url, fi)] == (fi * 1000, float(img.mean()))

    def test_media_payloads_are_real_containers(self, spark):
        """synth_media emits parseable PNG/WAV payloads whose decoded
        shape matches the metadata columns."""
        from rust_geo_booleanop_spark.functions.codecs import (
            decode_png_gray8,
            decode_wav_pcm16,
        )
        from rust_geo_booleanop_spark.operators import synth_media

        docs = spark.createDataFrame(
            [(f"https://ex.com/{i}",) for i in range(40)], "url string"
        )
        rows = synth_media(spark, docs).collect()
        kinds = {r.kind for r in rows}
        assert kinds == {"image", "audio"}
        for r in rows:
            if r.kind == "image":
                img = decode_png_gray8(bytes(r.media))
                assert img.shape == (r.height, r.width)
                assert bytes(r.media)[:8] == b"\x89PNG\r\n\x1a\n"
            else:
                samples, sr = decode_wav_pcm16(bytes(r.media))
                assert sr == r.sample_rate
                assert len(samples) == sr * min(r.duration_ms, 2000) // 1000


def test_image_pixel_dedup_counts_and_rep(spark):
    from rust_geo_booleanop_spark.operators import image_pixel_dedup

    # duplicate urls -> identical payloads -> one group with n_copies
    docs = spark.createDataFrame(
        [("img://grp/A",)] * 3 + [("img://grp/B",)] * 2 + [("img://grp/C",)],
        "url string",
    )
    media = synth_media(spark, docs, kinds=("image",))
    got = {r.rep_url: r for r in image_pixel_dedup(media).collect()}
    assert {u: got[u].n_copies for u in got} == {
        "img://grp/A": 3,
        "img://grp/B": 2,
        "img://grp/C": 1,
    }
    # hashes distinct across groups
    rows = list(got.values())
    assert len({r.pixel_md5 for r in rows}) == 3


def test_pixel_hash_is_content_not_container(spark):
    """Re-encoding identical pixels yields a byte-different PNG (extra
    chunk) but the SAME pixel hash — the property raw-payload hashing
    lacks and the reason the op decodes at all."""
    import numpy as np

    from rust_geo_booleanop_spark.functions.codecs import encode_png_gray8
    from rust_geo_booleanop_spark.operators.multimodal import pixel_hash_pdf
    import pandas as pd

    img = (np.arange(64 * 48) % 251).astype(np.uint8).reshape(48, 64)
    png1 = encode_png_gray8(img)
    # structurally different container: inject a private ancillary chunk
    # before IEND (valid PNG, identical pixels)
    import struct
    import zlib

    chunk_type = b"prVt"
    data = b"x" * 4
    crc = zlib.crc32(chunk_type + data) & 0xFFFFFFFF
    extra = struct.pack(">I", len(data)) + chunk_type + data + struct.pack(">I", crc)
    iend = png1.rindex(b"IEND") - 4
    png2 = png1[:iend] + extra + png1[iend:]
    assert png1 != png2

    pdf = pd.DataFrame(
        {
            "url": ["a", "b"],
            "media": [png1, png2],
            "width": [64, 64],
            "height": [48, 48],
        }
    )
    out = pixel_hash_pdf(pdf)
    assert out["pixel_md5"][0] == out["pixel_md5"][1]


def test_audio_energy_matches_wav_twin(spark):
    """audio_energy's integer features recomputed from the decoded WAV
    bytes directly (independent framing + arithmetic)."""
    import numpy as np

    from rust_geo_booleanop_spark.functions.codecs import decode_wav_pcm16
    from rust_geo_booleanop_spark.operators import audio_energy

    media = synth_media(spark, _docs(spark))
    got = {
        (r.url, r.frame_no): (r.energy, r.n_zc)
        for r in audio_energy(media, frame_ms=100, max_frames=4).collect()
    }
    assert got
    rows = media.filter("kind = 'audio'").select("url", "media", "sample_rate").collect()
    want = {}
    for r in rows:
        samples, sr = decode_wav_pcm16(bytes(r.media))
        assert sr == r.sample_rate
        flen = int(r.sample_rate * 100 / 1000)
        nf = min(4, max(1, len(samples) // flen))
        for fi in range(nf):
            fr = np.asarray(samples[fi * flen : (fi + 1) * flen], dtype=np.int64)
            if len(fr) == 0:
                continue
            nn = fr >= 0
            want[(r.url, fi)] = (int((fr * fr).sum()), int((nn[1:] != nn[:-1]).sum()))
    assert got == want


def test_audio_energy_zero_crossing_definition():
    """ZC counts sign-CLASS transitions ((s>=0) vs (s<0)): a zero sample
    sits in the nonnegative class, so +1,0,-1 crosses ONCE (at 0 -> -1)."""
    import numpy as np
    import pandas as pd

    from rust_geo_booleanop_spark.functions.codecs import encode_wav_pcm16
    from rust_geo_booleanop_spark.operators.multimodal import audio_energy_pdf

    samples = np.array([1, 0, -1, -2, 3, 0], dtype=np.int16)
    payload = encode_wav_pcm16(samples, 60)  # 60 Hz, 100ms frame = 6 samples
    pdf = pd.DataFrame(
        {"url": ["u"], "media": [payload], "sample_rate": [60], "duration_ms": [100]}
    )
    out = audio_energy_pdf(pdf, frame_ms=100, max_frames=1)
    assert out["energy"].tolist() == [1 + 0 + 1 + 4 + 9 + 0]
    # transitions: 0->-1 (cross), -2->3 (cross), 3->0 stays nonneg = 2
    assert out["n_zc"].tolist() == [2]


def test_zero_sample_rate_row_is_skipped_not_fatal():
    """Corrupt METADATA (sample_rate <= 0) must follow the same
    skip-the-row contract as a corrupt payload: frame_len would be 0 and
    `len(samples) // frame_len` used to ZeroDivisionError the whole task
    (round-5 advice fix); the good row still comes through."""
    import numpy as np
    import pandas as pd

    from rust_geo_booleanop_spark.functions.codecs import encode_wav_pcm16
    from rust_geo_booleanop_spark.operators.multimodal import (
        audio_energy_pdf,
        sample_audio_frames_pdf,
    )

    samples = np.array([1, 0, -1, -2, 3, 0], dtype=np.int16)
    good = encode_wav_pcm16(samples, 60)
    pdf = pd.DataFrame(
        {
            "url": ["bad", "good"],
            "media": [good, good],
            "sample_rate": [0, 60],
            "duration_ms": [100, 100],
        }
    )
    for fn in (audio_energy_pdf, sample_audio_frames_pdf):
        out = fn(pdf, frame_ms=100, max_frames=1)
        assert out["url"].tolist() == ["good"], fn.__name__


def test_image_stats_matches_decoded_twin(spark):
    """image_stats' integer folds recomputed from decode_png_gray8 directly."""
    import numpy as np

    from rust_geo_booleanop_spark.functions.codecs import decode_png_gray8
    from rust_geo_booleanop_spark.operators import image_stats

    media = synth_media(spark, _docs(spark))
    got = {
        r.url: (r.n_pixels, r.pixel_sum, r.min_pixel, r.max_pixel,
                r.n_dark, r.n_bright)
        for r in image_stats(media).collect()
    }
    assert got
    rows = media.filter("kind = 'image'").select("url", "media").collect()
    for r in rows:
        img = np.asarray(decode_png_gray8(bytes(r.media)), dtype=np.int64)
        want = (int(img.size), int(img.sum()), int(img.min()), int(img.max()),
                int((img == 0).sum()), int((img == 255).sum()))
        assert got[r.url] == want, r.url


def test_video_frame_stats_matches_sampled_decode_twin(spark):
    """video_frame_stats' integer folds recomputed from the MPNG seek
    path directly (same sampling grid as sample_video_frames)."""
    import numpy as np

    from rust_geo_booleanop_spark.functions.codecs import (
        decode_mpng_frame,
        mpng_info,
    )
    from rust_geo_booleanop_spark.operators import video_frame_stats

    media = synth_media(spark, _docs(spark), kinds=("image", "audio", "video"))
    got = {
        (r.url, r.frame_no): (r.n_pixels, r.pixel_sum, r.min_pixel, r.max_pixel)
        for r in video_frame_stats(media, every_ms=1000, max_frames=4).collect()
    }
    assert got
    rows = media.filter("kind = 'video'").select("url", "media", "duration_ms").collect()
    want = {}
    for r in rows:
        payload = bytes(r.media)
        n_avail, interval = mpng_info(payload)
        nf = min(4, max(1, int(r.duration_ms) // 1000))
        for fi in range(nf):
            idx = min(n_avail - 1, fi * 1000 // interval)
            img = np.asarray(decode_mpng_frame(payload, idx), dtype=np.int64)
            want[(r.url, fi)] = (int(img.size), int(img.sum()),
                                 int(img.min()), int(img.max()))
    assert got == want


def test_corrupt_media_payloads_are_skipped_not_fatal(spark):
    """A crawl-scale media corpus WILL contain corrupt containers
    (truncated bytes, wrong magic, bad DEFLATE streams); one such
    payload must not fail the Arrow batch (and with it the job). Every
    decode-seam operator skips the bad row and still extracts exact
    values from the clean rows sharing its batch."""
    from rust_geo_booleanop_spark.functions.codecs import (
        encode_mpng,
        encode_png_gray8,
        encode_wav_pcm16,
    )
    from rust_geo_booleanop_spark.operators.multimodal import (
        audio_energy,
        image_pixel_dedup,
        image_stats,
        resize_images,
        video_frame_stats,
    )
    import numpy as np

    img = (np.arange(64).reshape(8, 8) * 3).astype(np.uint8)
    wav = encode_wav_pcm16(
        (np.arange(16000) % 2000 - 1000).astype(np.int16), 16000
    )
    vid = encode_mpng([img, (img + 1).astype(np.uint8)], 1000)
    png = encode_png_gray8(img)
    import struct as _struct

    # a structurally valid PNG whose IHDR declares w=0 (decodes to an
    # empty raster that would crash feature folds past the seam)
    zero_w_png = encode_png_gray8(np.zeros((4, 1), dtype=np.uint8)).replace(
        _struct.pack(">II", 1, 4), _struct.pack(">II", 0, 4), 1
    )
    bad = [
        b"",  # empty
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 5,  # truncated after magic
        png[: len(png) // 2],  # truncated mid-IDAT
        b"RIFFgarbage",  # wav magic, no structure
        b"MPNG\xff\xff\xff\xff",  # video header, absurd frame count
        b"MPNG" + _struct.pack("<II", 2, 0) + b"junk",  # interval_ms == 0
        zero_w_png,  # degenerate 0-width raster
        bytes(200),  # zeros
    ]
    rows = []
    for kind, good_payload, w, h, sr, dur in (
        ("image", png, 8, 8, None, None),
        ("audio", wav, None, None, 16000, 1000),
        ("video", vid, 8, 8, None, 2000),
    ):
        rows.append((f"ok/{kind}", kind, good_payload, w, h, sr, dur, "x"))
        for i, b in enumerate(bad):
            rows.append((f"bad/{kind}/{i}", kind, b, w, h, sr, dur, "x"))
    media = spark.createDataFrame(
        rows,
        "url string, kind string, media binary, width int, height int, "
        "sample_rate int, duration_ms int, codec string",
    ).repartition(2)  # clean + corrupt rows share Arrow batches

    feats = {r.url: r for r in image_features(media).collect()}
    assert set(feats) == {"ok/image"}
    assert feats["ok/image"].mean_pixel == float(img.mean())

    stats = {r.url: r for r in image_stats(media).collect()}
    assert set(stats) == {"ok/image"}
    assert stats["ok/image"].pixel_sum == int(img.astype(np.int64).sum())

    thumbs = {r.url: r for r in resize_images(media, 4, 4).collect()}
    assert set(thumbs) == {"ok/image"}

    dedup = image_pixel_dedup(media).collect()
    assert [r.rep_url for r in dedup] == ["ok/image"]

    aframes = {r.url for r in sample_audio_frames(media).collect()}
    assert aframes == {"ok/audio"}
    energy = {r.url for r in audio_energy(media).collect()}
    assert energy == {"ok/audio"}

    vframes = {r.url for r in sample_video_frames(media).collect()}
    assert vframes == {"ok/video"}
    vstats = {r.url for r in video_frame_stats(media).collect()}
    assert vstats == {"ok/video"}
