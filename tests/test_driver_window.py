"""Pin the driver-window contract: the correctness gate checks the
FIRST 50 queries() entries, so (a) every query whose code changed this
round must sit inside the window, (b) the round's declared staleness
tier must actually be in the window, and (c) the registry stays fully
oracle-paired. Update the literals when the window rotates — the test
documents each round's rotation intent."""
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402

# round-10 rotation: new/changed code + the r3-r5 stale tier (33) — see
# the queries() docstring for the full composition
ROUND_CHANGED = {"q159_isotonic_calibration", "q160_streaming_mmr",
                 "q161_label_propagation", "q162_k_core",
                 "q96_pagerank", "q153_streaming_funnel"}
STALE_TIER = {
    "q10_quadkey", "q48_pointonsurface", "q51_buffer_line",
    "q52_buffer_polygon", "q59_reduceprecision", "q63_intersection_agg",
    "q26_ngram_jaccard", "q55_ann_ivf", "q58_linemerge_normalize",
    "q71_sample_stratified", "q72_pii_redact", "q73_paragraph_dedup",
    "q93_vec_quantize", "q05_centroid_collect", "q101_substring_dedup",
    "q102_c4_filters", "q104_semdedup", "q111_pca_power_iteration",
    "q114_hll_distinct", "q116_ann_ivfpq", "q35_transform",
    "q38_minhash_lsh", "q61_rtree_points", "q65_gpkg_roundtrip",
    "q69_dedup_components", "q77_chunk_documents", "q78_temperature_mix",
    "q79_dedup_pipeline", "q81_streaming_sessions", "q82_warc_pipeline",
    "q83_url_domain_stats", "q85_vocab_build", "q92_text_clean",
}


def test_changed_and_stale_queries_inside_window():
    window = set(list(entry.queries())[:50])
    assert ROUND_CHANGED <= window, ROUND_CHANGED - window
    assert STALE_TIER <= window, STALE_TIER - window


def test_every_query_is_oracle_paired():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    missing = [k for k in qs if k not in oracles]
    assert missing == [], missing
    stale = [k for k in oracles if k not in qs]
    assert stale == [], stale
