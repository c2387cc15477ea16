"""Regenerate the multimodal oracle fixtures (m01/m02/m03/m04/m05/m06/m07/m08).

Generated-oracle pattern (like d02): the fixtures are computed WITHOUT
Spark by the operators' own module-level pandas bodies
(operators/multimodal.py::synth_media_pdf / image_features_pdf /
sample_audio_frames_pdf / sample_video_frames_pdf / resize_images_pdf)
over the urls of doc_ids 0..4999 (covers sf0.1; the oracle SQL derives
the url set from the `documents` view, so smaller scale factors grade
their subset). The DuckDB comparison then cross-checks the Spark
plumbing — mapInPandas batching, Arrow binary transfer, filters, and
the aggregations (computed in SQL over the per-frame fixture rows, not
pre-aggregated) — against the local recompute.

Run after any change to operators/multimodal.py or functions/codecs.py.
Freshness pinned (sampled) by tests/test_oracle_fixtures.py.

Usage: python scripts/gen_media_oracle_fixtures.py
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "oracle_fixtures"
)
N_DOCS = 5000  # sf0.1's documents table: doc_ids 0..4999


def media_fixture_frames(doc_ids):
    """Spark-free recompute of the four m-query inputs for `doc_ids`.

    Returns (m01_rows, m02_rows, m03_rows, m04_rows):
      m01: (url, width, height, phash)                # per image
      m02: (url, frame_no, peak)                      # per audio frame
      m06: (url, frame_no, energy, n_zc)              # per audio frame
      m07: (url, n_pixels, pixel_sum, min/max, n_dark, n_bright)  # per image
      m08: (url, frame_no, n_pixels, pixel_sum, min/max)  # per video keyframe
      m03: (url, frame_no, ts_ms)                     # per video frame
      m04: (url, out_width, out_height, thumb_md5)    # per image
    """
    import pandas as pd

    from rust_geo_booleanop_spark.operators.multimodal import (
        audio_energy_pdf,
        image_features_pdf,
        image_stats_pdf,
        video_frame_stats_pdf,
        resize_images_pdf,
        sample_audio_frames_pdf,
        sample_video_frames_pdf,
        synth_media_pdf,
    )
    from rust_geo_booleanop_spark.sources.documents import synth_url

    urls = pd.DataFrame({"url": [synth_url(d) for d in doc_ids]})
    media2 = synth_media_pdf(urls, kinds=("image", "audio"))
    media3 = synth_media_pdf(urls, kinds=("image", "audio", "video"))

    img2 = media2[media2["kind"] == "image"]
    feats = image_features_pdf(img2)
    m01 = list(zip(feats["url"], feats["width"], feats["height"], feats["phash"]))

    aud2 = media2[media2["kind"] == "audio"]
    af = sample_audio_frames_pdf(aud2, frame_ms=100, max_frames=8)
    m02 = list(zip(af["url"], af["frame_no"], af["peak"]))

    ae = audio_energy_pdf(aud2, frame_ms=100, max_frames=8)
    m06 = list(zip(ae["url"], ae["frame_no"], ae["energy"], ae["n_zc"]))

    ist = image_stats_pdf(img2)
    m07 = list(zip(ist["url"], ist["n_pixels"], ist["pixel_sum"],
                   ist["min_pixel"], ist["max_pixel"], ist["n_dark"],
                   ist["n_bright"]))

    vid3 = media3[media3["kind"] == "video"]
    vf = sample_video_frames_pdf(vid3, every_ms=1000, max_frames=8)
    m03 = list(zip(vf["url"], vf["frame_no"], vf["ts_ms"]))

    vs = video_frame_stats_pdf(vid3, every_ms=1000, max_frames=8)
    m08 = list(zip(vs["url"], vs["frame_no"], vs["n_pixels"], vs["pixel_sum"],
                   vs["min_pixel"], vs["max_pixel"]))

    th = resize_images_pdf(img2, 16, 16)
    m04 = list(
        zip(
            th["url"],
            th["out_width"],
            th["out_height"],
            (hashlib.md5(b).hexdigest() for b in th["thumb"]),
        )
    )

    # m11: payload container sizes + duration metadata per (url, kind)
    # over the 3-kind table (image/audio/video)
    m11 = list(
        zip(
            media3["url"],
            media3["kind"],
            (len(b) for b in media3["media"]),
            media3["duration_ms"],
        )
    )
    return m01, m02, m03, m04, m06, m07, m08, m11


N_GROUPS = 200  # m05's dedup-group key space: doc_id % 200


def m05_fixture_rows():
    """Spark-free recompute of the m05 pixel-hash relation over the 200
    group urls (the query derives url = 'img://grp/<doc_id % 200>', so
    this covers every scale factor; the oracle SQL joins the live
    documents view for the per-group copy counts). Image-kind groups
    only — audio-kind groups are absent here AND filtered Spark-side."""
    import pandas as pd

    from rust_geo_booleanop_spark.operators.multimodal import (
        pixel_hash_pdf,
        synth_media_pdf,
    )

    urls = pd.DataFrame({"url": [f"img://grp/{k}" for k in range(N_GROUPS)]})
    media = synth_media_pdf(urls, kinds=("image", "audio"))
    img = media[media["kind"] == "image"]
    ph = pixel_hash_pdf(img)
    return list(zip(ph["url"], ph["width"], ph["height"], ph["pixel_md5"]))


def main():
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(FIXDIR, exist_ok=True)
    m01, m02, m03, m04, m06, m07, m08, m11 = media_fixture_frames(range(N_DOCS))
    m05 = m05_fixture_rows()

    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in m05], pa.string()),
                "width": pa.array([int(r[1]) for r in m05], pa.int32()),
                "height": pa.array([int(r[2]) for r in m05], pa.int32()),
                "pixel_md5": pa.array([r[3] for r in m05], pa.string()),
            }
        ),
        os.path.join(FIXDIR, "m05_pixel_hash_grp.parquet"),
        compression="zstd",
    )

    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in m01], pa.string()),
                "width": pa.array([int(r[1]) for r in m01], pa.int32()),
                "height": pa.array([int(r[2]) for r in m01], pa.int32()),
                "phash": pa.array([int(r[3]) for r in m01], pa.int64()),
            }
        ),
        os.path.join(FIXDIR, "m01_image_features_sf01.parquet"),
        compression="zstd",
    )
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in m02], pa.string()),
                "frame_no": pa.array([int(r[1]) for r in m02], pa.int32()),
                "peak": pa.array([int(r[2]) for r in m02], pa.int32()),
            }
        ),
        os.path.join(FIXDIR, "m02_audio_frames_sf01.parquet"),
        compression="zstd",
    )
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in m06], pa.string()),
                "frame_no": pa.array([int(r[1]) for r in m06], pa.int32()),
                "energy": pa.array([int(r[2]) for r in m06], pa.int64()),
                "n_zc": pa.array([int(r[3]) for r in m06], pa.int32()),
            }
        ),
        os.path.join(FIXDIR, "m06_audio_energy_sf01.parquet"),
        compression="zstd",
    )
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in m07], pa.string()),
                "n_pixels": pa.array([int(r[1]) for r in m07], pa.int64()),
                "pixel_sum": pa.array([int(r[2]) for r in m07], pa.int64()),
                "min_pixel": pa.array([int(r[3]) for r in m07], pa.int32()),
                "max_pixel": pa.array([int(r[4]) for r in m07], pa.int32()),
                "n_dark": pa.array([int(r[5]) for r in m07], pa.int64()),
                "n_bright": pa.array([int(r[6]) for r in m07], pa.int64()),
            }
        ),
        os.path.join(FIXDIR, "m07_image_stats_sf01.parquet"),
        compression="zstd",
    )
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in m08], pa.string()),
                "frame_no": pa.array([int(r[1]) for r in m08], pa.int32()),
                "n_pixels": pa.array([int(r[2]) for r in m08], pa.int64()),
                "pixel_sum": pa.array([int(r[3]) for r in m08], pa.int64()),
                "min_pixel": pa.array([int(r[4]) for r in m08], pa.int32()),
                "max_pixel": pa.array([int(r[5]) for r in m08], pa.int32()),
            }
        ),
        os.path.join(FIXDIR, "m08_video_frame_stats_sf01.parquet"),
        compression="zstd",
    )
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in m11], pa.string()),
                "kind": pa.array([r[1] for r in m11], pa.string()),
                "n_bytes": pa.array([int(r[2]) for r in m11], pa.int64()),
                "duration_ms": pa.array(
                    [None if r[3] != r[3] else int(r[3]) for r in m11], pa.int32()
                ),
            }
        ),
        os.path.join(FIXDIR, "m11_media_sizes_sf01.parquet"),
        compression="zstd",
    )
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in m03], pa.string()),
                "frame_no": pa.array([int(r[1]) for r in m03], pa.int32()),
                "ts_ms": pa.array([int(r[2]) for r in m03], pa.int32()),
            }
        ),
        os.path.join(FIXDIR, "m03_video_frames_sf01.parquet"),
        compression="zstd",
    )
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in m04], pa.string()),
                "out_width": pa.array([int(r[1]) for r in m04], pa.int32()),
                "out_height": pa.array([int(r[2]) for r in m04], pa.int32()),
                "thumb_md5": pa.array([r[3] for r in m04], pa.string()),
            }
        ),
        os.path.join(FIXDIR, "m04_thumbs_sf01.parquet"),
        compression="zstd",
    )
    print(
        f"m01: {len(m01)} images, m02: {len(m02)} audio frames, "
        f"m06: {len(m06)} energy frames, "
        f"m03: {len(m03)} video frames, m04: {len(m04)} thumbs, "
        f"m05: {len(m05)} group pixel hashes -> {FIXDIR}"
    )


if __name__ == "__main__":
    main()
