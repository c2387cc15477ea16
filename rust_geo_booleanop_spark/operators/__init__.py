from .extract import extract_geometries, GEOMETRIES_SCHEMA
from .boolean_join import (
    apply_boolean_ops,
    boolean_pipeline,
    pair_candidates,
    DEFAULT_OPS,
)
from .tiling import assign_tiles, clip_to_tiles
from .spatial_join import (
    candidate_pairs,
    knn_join,
    knn_join_bucketed,
    point_in_polygon_join,
    with_cover_cells,
    with_point_cells,
    zonal_stats_join,
)
from .dedup import (
    exact_dedup,
    exact_dup_stats,
    jaccard_verify,
    minhash_candidates,
    minhash_dedup,
    ngram_jaccard_pairs,
    ngram_shingle_col,
    simhash_candidates,
    simhash_dedup,
)
from .similarity import (
    assign_ivf_lists,
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_cosine_topk,
    ivf_pivots,
    lsh_cosine_topk,
    with_lsh_bucket,
)
from .text import (
    document_fingerprint,
    quality_score,
    token_count_col,
    with_detected_language,
    with_text_stats,
)
from .dissolve import dissolve
from .temporal import asof_join, sessionize
from .skew import cell_histogram, hot_keys, salted_join
from .multimodal import (
    image_features,
    resize_images,
    sample_audio_frames,
    sample_video_frames,
    synth_media,
)

__all__ = [
    "extract_geometries",
    "GEOMETRIES_SCHEMA",
    "apply_boolean_ops",
    "boolean_pipeline",
    "pair_candidates",
    "DEFAULT_OPS",
    "assign_tiles",
    "clip_to_tiles",
    "candidate_pairs",
    "knn_join",
    "knn_join_bucketed",
    "point_in_polygon_join",
    "with_cover_cells",
    "with_point_cells",
    "zonal_stats_join",
    "exact_dedup",
    "exact_dup_stats",
    "jaccard_verify",
    "minhash_candidates",
    "minhash_dedup",
    "ngram_jaccard_pairs",
    "ngram_shingle_col",
    "simhash_candidates",
    "simhash_dedup",
    "assign_ivf_lists",
    "cosine_topk",
    "embedding_near_dup_pairs",
    "ivf_cosine_topk",
    "ivf_pivots",
    "lsh_cosine_topk",
    "with_lsh_bucket",
    "document_fingerprint",
    "quality_score",
    "token_count_col",
    "with_detected_language",
    "with_text_stats",
    "asof_join",
    "dissolve",
    "sessionize",
    "cell_histogram",
    "hot_keys",
    "salted_join",
    "image_features",
    "resize_images",
    "sample_audio_frames",
    "sample_video_frames",
    "synth_media",
]
