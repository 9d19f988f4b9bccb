from .cluster import (  # noqa: F401
    st_cluster,
    st_cluster_append,
    st_cluster_bbox,
    st_cluster_compact,
    st_cluster_delete,
    st_filter_points,
    st_layout_info,
    with_bbox_columns,
)
from .invindex import (  # noqa: F401
    bm25_search,
    build_inverted_index,
    build_positional_index,
    build_scored_index,
    conjunctive_query,
    index_term_stats,
    phrase_query,
    scored_index_append,
)
from .shard import shard_assign, shard_assign_sql, shard_write  # noqa: F401
from .zorder import (  # noqa: F401
    zorder_append,
    zorder_cluster,
    zorder_compact,
    zorder_key,
)
from .join import st_join, st_join_broadcast, st_join_points  # noqa: F401
from .knn import st_knn_join  # noqa: F401
from .dedup import (  # noqa: F401
    dedup_pipeline,
    exact_dedup,
    hamming_neardup_pairs,
    jaccard_verify,
    minhash_dedup,
    connected_components,
    minhash_lsh_candidates,
    minhash_signature,
    minhash_table,
    ngram_jaccard_join,
    shingles,
    simhash,
    simhash_candidates,
    simhash_table,
)
from .similarity import (  # noqa: F401
    ann_bruteforce_topk,
    ann_ivf_topk,
    ann_lsh_topk,
    cluster_balanced_sample,
    cosine_similarity,
    dot,
    embedding_neardup_pairs,
    l2_norm,
    load_ivf_centroids,
    save_ivf_centroids,
    train_ivf_centroids,
)
from . import textops  # noqa: F401
from . import urlops  # noqa: F401
from .pipeline import (  # noqa: F401
    GOPHER_REPETITION_THRESHOLDS,
    PII_PATTERNS,
    benchmark_ngrams,
    decontaminate,
    gopher_repetition_filter,
    group_sample,
    group_sample_sql,
    hash_sample,
    ngram_novelty,
    paragraph_dedup,
    pii_count,
    redact_pii,
    repetition_metrics,
    stratified_sample,
    token_budget_mix,
    token_budget_sql,
    weighted_sample,
    weighted_sample_sql,
    word_ngrams,
)
from .multimodal import (  # noqa: F401
    attach_media_metadata,
    audio_features,
    audio_features_col,
    frame_sample,
    image_features,
    image_features_col,
    image_resize,
    image_resize_col,
    resize_image_array,
    video_metadata,
    video_metadata_col,
)
