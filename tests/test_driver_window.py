"""Pin the driver-window contract: the correctness gate checks the
FIRST 50 queries() entries, so (a) every query whose code changed this
round must sit inside the window, (b) the round's declared staleness
tier must actually be in the window, and (c) the registry stays fully
oracle-paired. Update the literals when the window rotates — the test
documents each round's rotation intent."""
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402

# round-11 rotation: new/changed code + the full r6/r7 stale tier (21)
# + the 24 oldest-prior-evidence r8 rows — see the queries() docstring
ROUND_CHANGED = {"q163_pca_rotation_pq", "q164_hits",
                 "q159_isotonic_calibration", "q160_streaming_mmr",
                 "q152_session_funnel"}
STALE_TIER = {
    # r6 (all 8)
    "q57_shortestline", "q75_streaming_extent", "q90_domain_quota",
    "q97_salted_agg", "q99_minhash_index", "q103_bm25_topk",
    "q118_salted_join", "q123_hll_overlap",
    # r7 (all 13)
    "q60_spheroid", "q76_pack_sequences", "q95_profile_table",
    "q98_corpus_diff", "q112_asof_join", "q124_corpus_divergence",
    "q128_triangle_count", "q130_inverted_index",
    "q132_shard_permutation", "q133_zorder_layout",
    "q134_phrase_search", "q135_cluster_balanced_sample",
    "q147_weighted_sample",
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
