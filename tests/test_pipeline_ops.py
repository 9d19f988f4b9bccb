"""Training-data pipeline operator tests (dedup / similarity / text /
multimodal), run on the driver-provided documents+embeddings tables plus
purpose-built fixtures."""

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators import (
    ann_bruteforce_topk,
    ann_lsh_topk,
    attach_media_metadata,
    cosine_similarity,
    embedding_neardup_pairs,
    exact_dedup,
    image_features,
    frame_sample,
    minhash_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_join,
    simhash,
    simhash_candidates,
    textops,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "aaa")], ["id", "text"]
    )
    out = exact_dedup(df, ["text"], "id")
    assert sorted(r["id"] for r in out.collect()) == [1, 2]


def test_minhash_dedup_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods"
    rows = [
        (1, base),
        (2, base + " tonight"),          # near-dup of 1
        (3, "completely different content about database engines and query plans"),
        (4, base),                        # exact dup of 1
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    cand = minhash_lsh_candidates(df, "id", "text", num_hashes=16, bands=8, k=4)
    pairs = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert (1, 4) in pairs and (1, 2) in pairs
    kept = minhash_dedup(df, "id", "text", threshold=0.6, num_hashes=16, bands=8, k=4)
    ids = sorted(r["id"] for r in kept.collect())
    assert ids == [1, 3]


def test_ngram_jaccard_join(spark):
    rows = [(1, "abcdefgh"), (2, "abcdefgx"), (3, "zzzzyyyy")]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           ngram_jaccard_join(df, "id", "text", k=3, threshold=0.3).collect()}
    assert (1, 2) in out and out[(1, 2)] > 0.5
    assert (1, 3) not in out


def test_simhash_deterministic_and_buckets(spark):
    df = spark.createDataFrame(
        [(1, "hello world foo bar"), (2, "hello world foo bar"), (3, "xyz")],
        ["id", "text"],
    )
    sh = df.select("id", simhash(F.col("text")).alias("s")).collect()
    vals = {r["id"]: r["s"] for r in sh}
    assert vals[1] == vals[2] != vals[3]
    cand = simhash_candidates(df, "id", "text")
    assert (1, 2) in {(r["id_a"], r["id_b"]) for r in cand.collect()}


def test_simhash_table_matches_column_form(spark, docs):
    from duckdb_spatial_spark.operators import simhash_table

    d = docs.limit(40)
    col_form = {
        r["doc_id"]: r["s"]
        for r in d.select("doc_id", simhash(F.col("text")).alias("s")).collect()
    }
    tbl_form = {
        r["doc_id"]: r["simhash"]
        for r in simhash_table(d, "doc_id", "text").collect()
    }
    assert col_form == tbl_form


def test_minhash_table_matches_column_form(spark, docs):
    from duckdb_spatial_spark.operators import minhash_signature, minhash_table

    d = docs.limit(40)
    col_form = {
        r["doc_id"]: (r["sig"][0], r["sig"][1], r["sig"][2])
        for r in d.select(
            "doc_id", minhash_signature(F.col("text"), 3, k=4).alias("sig")
        ).collect()
    }
    tbl_form = {
        r["doc_id"]: (r["mh0"], r["mh1"], r["mh2"])
        for r in minhash_table(d, "doc_id", "text", num_hashes=3, k=4).collect()
    }
    assert col_form == tbl_form


def test_ann_bruteforce_vs_duckdb(spark, emb):
    import duckdb

    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = ann_bruteforce_topk(emb, queries, k=5).collect()
    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH q AS (SELECT vec_id qid, embedding qv FROM '{SF}/embeddings.parquet'
                   ORDER BY vec_id LIMIT 3),
             c AS (SELECT vec_id, embedding FROM '{SF}/embeddings.parquet')
        SELECT qid, vec_id, rank FROM (
          SELECT q.qid, c.vec_id,
                 row_number() OVER (PARTITION BY q.qid
                     ORDER BY list_cosine_similarity(c.embedding, q.qv) DESC, c.vec_id) rank
          FROM c, q)
        WHERE rank <= 5
        """
    ).fetchall()
    got_set = {(r["query_id"], r["vec_id"], r["rank"]) for r in got}
    assert got_set == set(want)


def test_ann_lsh_recall(spark, emb):
    queries = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = ann_bruteforce_topk(emb, queries, k=3).collect()
    approx = ann_lsh_topk(emb, queries, k=3, n_planes=6, dim=64).collect()
    exact_set = {(r["query_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["query_id"], r["vec_id"]) for r in approx}
    # self-match always survives (same bucket), recall is best-effort
    assert {(q, q) for q in (0, 1, 2, 3, 4)} <= approx_set
    assert len(approx_set & exact_set) >= 5


def test_embedding_neardup_exact_self(spark, emb):
    out = embedding_neardup_pairs(emb.limit(50), threshold=0.999, exact=True).collect()
    # synthetic embeddings: no exact dups expected, but the operator runs
    for r in out:
        assert r["id_a"] < r["id_b"]


def test_textops(spark, docs):
    row = (
        docs.select(
            "doc_id",
            textops.token_count(F.col("text")).alias("tokens"),
            textops.punct_ratio(F.col("text")).alias("punct"),
            textops.quality_score(F.col("text")).alias("q"),
            textops.language_id(F.col("text")).alias("lang_guess"),
            textops.fingerprint(F.col("text")).alias("fp"),
        )
        .first()
    )
    assert row["tokens"] > 0
    assert 0.0 <= row["punct"] <= 1.0
    assert 0.0 <= row["q"] <= 1.0
    assert isinstance(row["lang_guess"], str)
    assert row["fp"] is not None


def test_token_count_literals(spark):
    df = spark.createDataFrame([("a b  c",), ("",), ("  ",), ("one",)], ["t"])
    out = [r["n"] for r in df.select(textops.token_count(F.col("t")).alias("n")).collect()]
    assert out == [3, 0, 0, 1]


def test_winnowing(spark):
    df = spark.createDataFrame([("abcdefghijklmnop",), ("abcdefghijklmnop",)], ["t"])
    out = df.select(textops.winnowing_fingerprints(F.col("t")).alias("w")).collect()
    assert out[0]["w"] == out[1]["w"] and len(out[0]["w"]) >= 1


def test_multimodal_plumbing(spark):
    rows = [(1, b"fake-image-bytes-1"), (2, b"fake-image-bytes-2"), (3, None)]
    df = spark.createDataFrame(rows, ["id", "payload"])
    df = attach_media_metadata(df, "payload", "image", "jpeg")
    meta = {r["id"]: r["media_meta"] for r in df.collect()}
    assert meta[1]["byte_size"] == 18 and meta[1]["media_type"] == "image"

    feats = image_features(df, "payload", fake=True)
    got = {r["id"]: r["img_features"] for r in feats.collect()}
    assert got[1]["phash"] is not None and got[3] is None or got[3]["phash"] is None
    # deterministic: same payload → same features
    feats2 = {r["id"]: r["img_features"] for r in image_features(df, "payload", fake=True).collect()}
    assert feats2[1] == got[1]

    # native decode path: unrecognized bytes → ValueError; compressed
    # formats (JPEG magic) → NotImplementedError naming the codec gap
    with pytest.raises(Exception, match="unrecognized image payload"):
        image_features(df, "payload").collect()
    jpeg_df = spark.createDataFrame(
        [(1, b"\xff\xd8\xffrest")], ["id", "payload"]
    )
    with pytest.raises(Exception, match="JPEG"):
        image_features(jpeg_df, "payload").collect()

    frames = {r["id"]: r["frames"] for r in frame_sample(df, "payload", n_frames=3, fake=True).collect()}
    assert len(frames[1]) == 3


def test_language_id_ngram(spark):
    from duckdb_spatial_spark.operators.textops import language_id_ngram

    df = spark.createDataFrame(
        [("the cat sat on the mat and the dog barked at the moon",),
         ("die katze saß auf der matte und der hund bellte den mond an",),
         ("le chat était assis sur le tapis et le chien aboyait à la lune",),
         ("el gato se sentó en la alfombra y el perro ladró a la luna",),
         ("",)],
        ["text"],
    ).coalesce(1)
    out = [r["lang"] for r in df.select(language_id_ngram(F.col("text")).alias("lang")).collect()]
    assert out == ["en", "de", "fr", "es", "und"]


def test_ann_ivf_recall(spark):
    from duckdb_spatial_spark.operators import ann_bruteforce_topk, ann_ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = (
        emb.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"))
    )
    exact = ann_bruteforce_topk(emb, queries, k=5)
    approx = ann_ivf_topk(emb, queries, k=5, n_centroids=32, nprobe=8)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall
    # self-match always survives (query is in its own cell)
    assert all((i, i) in a for i in range(5))


def test_ngram_prefix_filter_matches_full_join(spark):
    """Prefix-filtered plan returns exactly the plain inverted-index result."""
    from duckdb_spatial_spark.operators import ngram_jaccard_join
    from duckdb_spatial_spark.sources import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        F.col("doc_id") < 80
    )
    fast = ngram_jaccard_join(d, "doc_id", "text", k=4, threshold=0.12)
    slow = ngram_jaccard_join(d, "doc_id", "text", k=4, threshold=0.12,
                              prefix_filter=False)
    rf = {(r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in fast.collect()}
    rs = {(r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in slow.collect()}
    assert rf == rs
    assert len(rf) > 0


def test_connected_components_clusters(spark):
    """Hand-built graph: {1-2, 2-3} ∪ {5-6} ∪ singletons {4, 9} →
    components {1,1,1}, {5,5}, {4}, {9}; min-label representative."""
    from duckdb_spatial_spark.operators import connected_components
    from pyspark.sql import functions as F

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (6, 5)], "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5, 6, 9)],
                                  "id long")
    out = {r["id"]: r["comp"]
           for r in connected_components(pairs, nodes=nodes).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 9: 9}
    # a longer chain exercises multi-round convergence: 10-11-...-16
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10, 16)], "id_a long, id_b long")
    out2 = {r["id"]: r["comp"]
            for r in connected_components(chain).collect()}
    assert all(v == 10 for v in out2.values()) and len(out2) == 7


def test_connected_components_tiers_agree(spark):
    """The guarded driver fast path (tier 2) and the iterative min-label
    scale path (tier 3, forced via driver_node_limit=0) produce identical
    labelings on a random multi-component graph with chains and cycles."""
    import random

    from duckdb_spatial_spark.operators import connected_components

    rng = random.Random(42)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = {r["id"]: r["comp"]
            for r in connected_components(pairs, id_col="id").collect()}
    slow = {r["id"]: r["comp"]
            for r in connected_components(
                pairs, id_col="id", driver_node_limit=0).collect()}
    assert fast == slow and len(fast) > 0


def test_lsh_bucket_cap_star_equivalence(spark):
    """With a tiny bucket_cap the hot buckets emit stars; the candidate
    graph's CONNECTED COMPONENTS are identical to the uncapped all-pairs
    graph (the property the downstream cluster step needs)."""
    from duckdb_spatial_spark.operators import (connected_components,
                                                minhash_lsh_candidates)

    rows = [(i, f"dup dup dup dup shared boilerplate text block") for i in range(20)] \
        + [(100 + i, f"unique document number {i} with its own words entirely")
           for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = minhash_lsh_candidates(df, "doc_id", "text", num_hashes=4,
                                  bands=2, k=3, bucket_cap=None)
    capped = minhash_lsh_candidates(df, "doc_id", "text", num_hashes=4,
                                    bands=2, k=3, bucket_cap=4)
    n_full, n_capped = full.count(), capped.count()
    assert n_capped < n_full  # the cap actually reduced the pair count
    comp_a = {r["id"]: r["comp"] for r in connected_components(
        full, id_col="id").collect()}
    comp_b = {r["id"]: r["comp"] for r in connected_components(
        capped, id_col="id").collect()}
    assert comp_a == comp_b


def test_ngram_collapse_identical_connectivity(spark):
    """collapse_identical: component structure of the similarity graph is
    preserved at linear output cost under duplicate multiplicity."""
    from duckdb_spatial_spark.operators import (connected_components,
                                                ngram_jaccard_join)

    rows = ([(i, "abcdefghijkl") for i in range(8)]          # 8 copies
            + [(50, "abcdefghijkx")]                          # near-dup of them
            + [(60, "zzzzyyyyxxxx"), (61, "zzzzyyyyxxxw")])   # separate pair
    df = spark.createDataFrame(rows, "id long, text string")
    full = ngram_jaccard_join(df, "id", "text", k=3, threshold=0.5)
    fast = ngram_jaccard_join(df, "id", "text", k=3, threshold=0.5,
                              collapse_identical=True)
    n_full, n_fast = full.count(), fast.count()
    assert n_fast < n_full  # 8 copies: 28 identity pairs -> 7 star pairs
    ca = {r["id"]: r["comp"] for r in connected_components(
        full, id_col="id").collect()}
    cb = {r["id"]: r["comp"] for r in connected_components(
        fast, id_col="id").collect()}
    assert ca == cb
    # representative-level jaccard values survive the collapse
    jf = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9)
          for r in fast.collect()}
    assert jf[(0, 50)] == pytest.approx(
        {(r["id_a"], r["id_b"]): r["jaccard"]
         for r in full.collect()}[(0, 50)])


def test_embedding_collapse_identical(spark, emb):
    """Replicated identical vectors: collapsed form keeps component
    structure with linearly many pairs."""
    from duckdb_spatial_spark.operators import connected_components

    base = emb.limit(10)
    rep = base
    for s in (1000, 2000, 3000):
        rep = rep.unionByName(base.withColumn(
            "vec_id", F.col("vec_id") + F.lit(s)))
    full = embedding_neardup_pairs(rep, threshold=0.99)
    fast = embedding_neardup_pairs(rep, threshold=0.99,
                                   collapse_identical=True)
    n_full, n_fast = full.count(), fast.count()
    assert n_fast < n_full  # 4 copies each: 6 pairs -> 3 star pairs
    ca = {r["id"]: r["comp"] for r in connected_components(
        full, id_col="id").collect()}
    cb = {r["id"]: r["comp"] for r in connected_components(
        fast, id_col="id").collect()}
    assert ca == cb


def test_ngram_prefix_positional_filter_exact(spark):
    """The ppjoin positional filter must not lose pairs: prefix-filtered
    output == plain inverted-index output on a randomized corpus with
    planted near-dups, across thresholds."""
    import random

    from duckdb_spatial_spark.operators import ngram_jaccard_join

    rng = random.Random(7)
    alphabet = "abcdefgh"
    docs = []
    for i in range(60):
        docs.append((i, "".join(rng.choice(alphabet) for _ in range(40))))
    # planted near-dups: single-char edits of existing docs
    for i in range(20):
        base = docs[i][1]
        p = rng.randrange(len(base))
        docs.append((1000 + i, base[:p] + rng.choice(alphabet) + base[p + 1:]))
    df = spark.createDataFrame(docs, "id long, text string")
    for t in (0.5, 0.8):
        fast = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9)
                for r in ngram_jaccard_join(df, "id", "text", k=3,
                                            threshold=t).collect()}
        slow = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9)
                for r in ngram_jaccard_join(df, "id", "text", k=3, threshold=t,
                                            prefix_filter=False).collect()}
        assert fast == slow, f"t={t}: {set(slow) - set(fast)} lost"
        assert len(fast) > 0


def test_ivf_centroid_persistence(spark, emb, tmp_path):
    """Train-once/assign-anywhere: persisted centroids reload bit-exact
    and drive the same IVF results."""
    import numpy as np

    from duckdb_spatial_spark.operators import (ann_ivf_topk,
                                                load_ivf_centroids,
                                                save_ivf_centroids,
                                                train_ivf_centroids)

    C = train_ivf_centroids(emb, n_centroids=8, sample=200, iters=4)
    p = str(tmp_path / "ivf_index")
    save_ivf_centroids(spark, C, p)
    C2 = load_ivf_centroids(spark, p)
    assert C2.shape == C.shape and np.array_equal(C, C2)
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    a = {(r["query_id"], r["vec_id"], r["rank"])
         for r in ann_ivf_topk(emb, queries, k=3, centroids=C).collect()}
    b = {(r["query_id"], r["vec_id"], r["rank"])
         for r in ann_ivf_topk(emb, queries, k=3, centroids=C2).collect()}
    assert a == b and len(a) > 0


def test_dedup_pipeline_end_to_end(spark):
    """One-call dedup: exact + near dups collapse to cluster minima;
    cluster map covers every input row."""
    from duckdb_spatial_spark.operators import dedup_pipeline

    base = "the quick brown fox jumps over the lazy dog into the woods"
    rows = [
        (1, base), (2, base),                      # exact dups
        (3, base + " tonight"),                    # near dup of 1/2
        (4, "completely different text about query planners and joins"),
        (5, "another unrelated document with its own content entirely"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    kept, clusters = dedup_pipeline(
        df, "id", "text", method="minhash", threshold=0.6,
        num_hashes=16, bands=8, k=4, return_clusters=True)
    assert sorted(r["id"] for r in kept.collect()) == [1, 4, 5]
    cm = {r["id"]: r["comp"] for r in clusters.collect()}
    assert cm == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5}
    # exact-only mode keeps near-dups apart
    kept2 = dedup_pipeline(df, "id", "text", method="exact")
    assert sorted(r["id"] for r in kept2.collect()) == [1, 3, 4, 5]


def test_connected_components_no_duplicate_rows(spark):
    """Regression: a node whose edges land in several partitions must
    produce exactly ONE output row (the tier-2 star collect used to emit
    duplicate labels that fanned out the final join)."""
    from duckdb_spatial_spark.operators import connected_components

    # hub node 0 touches every partition of a 16-slice edge list
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 65)], "id_a long, id_b long"
    ).repartition(16)
    out = connected_components(pairs, id_col="id").collect()
    ids = [r["id"] for r in out]
    assert len(ids) == len(set(ids)) == 65
    assert all(r["comp"] == 0 for r in out)
    # and through the guarded driver path with nodes attached
    nodes = spark.createDataFrame([(i,) for i in range(70)], "id long")
    out2 = connected_components(pairs, nodes=nodes, id_col="id").collect()
    ids2 = [r["id"] for r in out2]
    assert len(ids2) == len(set(ids2)) == 70


def test_minhash_dedup_exact_default_and_cap_knob(spark):
    """ADVICE r3: minhash_dedup must NOT silently inherit the candidate
    generator's bucket_cap — its keep-first drop has no connected-components
    step, so the star approximation is not connectivity-safe there. The
    default is exact (None); the knob is exposed for callers who accept
    the recall trade."""
    import inspect

    from duckdb_spatial_spark.operators import dedup as dd

    sig = inspect.signature(minhash_dedup)
    assert sig.parameters["bucket_cap"].default is None

    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(6)]
    rows += [(10, "completely different text about spark and parquet files")]
    df = spark.createDataFrame(rows, "doc_id long, body string")
    kept_exact = minhash_dedup(df, "doc_id", "body")
    # 6 identical docs collapse to min id; the unrelated doc survives
    assert sorted(r.doc_id for r in kept_exact.collect()) == [0, 10]
    # capped path accepts the knob and, for identical texts (star edges
    # verify at jaccard 1.0), agrees with the exact result
    kept_capped = minhash_dedup(df, "doc_id", "body", bucket_cap=2)
    assert sorted(r.doc_id for r in kept_capped.collect()) == [0, 10]


def test_dedup_pipeline_simhash_forwards_tuning(spark, monkeypatch):
    """ADVICE r3: dedup_pipeline(method='simhash') must forward bands and
    the new bits knob to simhash_candidates instead of dropping them."""
    from duckdb_spatial_spark.operators import dedup as dd

    seen = {}
    real = dd.simhash_candidates

    def spy(df, id_col, text_col, bits=16, bands=4, bucket_cap=512):
        seen["bits"], seen["bands"] = bits, bands
        return real(df, id_col, text_col, bits=bits, bands=bands,
                    bucket_cap=bucket_cap)

    monkeypatch.setattr(dd, "simhash_candidates", spy)
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "unrelated words entirely here")],
        "doc_id long, body string")
    kept = dd.dedup_pipeline(df, "doc_id", "body", method="simhash",
                             bands=8, bits=16)
    assert seen == {"bits": 16, "bands": 8}
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3]


def test_embedding_collapse_identical_null_elements(spark):
    """ADVICE r3: concat_ws drops null elements, so [1,null,2] and [1,2]
    used to share a fingerprint and emit a false cosine-1.0 star pair."""
    df = spark.createDataFrame(
        [(1, [1.0, None, 2.0]), (2, [1.0, 2.0, None])],
        "vec_id long, embedding array<double>")
    out = embedding_neardup_pairs(
        df, threshold=0.0, exact=True, collapse_identical=True).collect()
    # different null positions => different vectors => no identity star;
    # cosine over a null element is null => filtered, so no pair at all
    assert out == []
    # genuinely identical vectors (nulls in the same slots) still collapse
    df2 = spark.createDataFrame(
        [(1, [1.0, None, 2.0]), (2, [1.0, None, 2.0])],
        "vec_id long, embedding array<double>")
    out2 = embedding_neardup_pairs(
        df2, threshold=0.0, exact=True, collapse_identical=True).collect()
    assert [(r.id_a, r.id_b, r.cosine) for r in out2] == [(1, 2, 1.0)]


def test_quality_buckets_exact(spark, docs):
    from duckdb_spatial_spark.operators.pipeline import quality_buckets

    b = quality_buckets(docs, "text", "lang", n_buckets=3, exact=True)
    # every doc kept, buckets within [1,3], per-lang sizes differ by <= 1
    assert b.count() == docs.count()
    sizes = {(r.lang, r.bucket): r["count"] for r in
             b.groupBy("lang", "bucket").count().collect()}
    assert all(1 <= k[1] <= 3 for k in sizes)
    for lang in {k[0] for k in sizes}:
        per = [v for (lg, _), v in sizes.items() if lg == lang]
        assert max(per) - min(per) <= 1
    # bucket 1 has higher mean quality than bucket 3 in every language
    from duckdb_spatial_spark.operators.textops import quality_score

    m = {(r.lang, r.bucket): r.q for r in
         b.groupBy("lang", "bucket")
          .agg(F.avg(quality_score(F.col("text"))).alias("q")).collect()}
    for lang in {k[0] for k in m}:
        assert m[(lang, 1)] >= m[(lang, 3)]


def test_quality_buckets_approx_close_to_exact(spark, docs):
    from duckdb_spatial_spark.operators.pipeline import quality_buckets

    ex = quality_buckets(docs, "text", "lang", n_buckets=3, exact=True) \
        .select("doc_id", F.col("bucket").alias("b_ex"))
    ap = quality_buckets(docs, "text", "lang", n_buckets=3, exact=False) \
        .select("doc_id", F.col("bucket").alias("b_ap"))
    j = ex.join(ap, "doc_id")
    n = j.count()
    assert n == docs.count()
    # approx path agrees for the overwhelming majority; never off by > 1
    agree = j.filter(F.col("b_ex") == F.col("b_ap")).count()
    assert agree >= 0.9 * n
    assert j.filter(F.abs(F.col("b_ex") - F.col("b_ap")) > 1).count() == 0


def test_split_sentences(spark):
    from duckdb_spatial_spark.operators.textops import (split_sentences,
                                                        split_sentences_sql)
    import duckdb

    samples = ["One two. Three four! Five? Six", "no terminators here",
               "...", "a.b.c", "  spaced .  out !  ", ""]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = [r.x for r in
           df.select(split_sentences(F.col("t")).alias("x")).collect()]
    assert got[0] == ["One two.", "Three four!", "Five?", "Six"]
    assert got[1] == ["no terminators here"]
    con = duckdb.connect()
    for s, g in zip(samples, got):
        want = con.execute(
            f"SELECT {split_sentences_sql('?')}", [s]).fetchone()[0]
        assert g == want, repr(s)


def test_cap_per_key(spark):
    from duckdb_spatial_spark.operators.pipeline import cap_per_key

    rows = [(i, f"k{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, key string")
    kept = cap_per_key(df, "key", 4, "id").collect()
    by = {}
    for r in kept:
        by.setdefault(r.key, []).append(r.id)
    # first 4 ids of each key in id order, deterministically
    assert {k: sorted(v) for k, v in by.items()} == {
        "k0": [0, 3, 6, 9], "k1": [1, 4, 7, 10], "k2": [2, 5, 8, 11]}


def test_clean_text(spark):
    from duckdb_spatial_spark.operators.textops import (clean_text,
                                                        clean_text_sql)
    import duckdb

    samples = ["café", "a\x00b\x07c", "keep\ttabs\nand\nnewlines",
               "zero​width‍ chars﻿", "한국어 ﬁne", ""]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = [r.c for r in
           df.select(clean_text(F.col("t")).alias("c")).collect()]
    assert got[0] == "café" and len(got[0]) == 4  # NFC composed
    assert got[1] == "abc"
    assert got[2] == "keep\ttabs\nand\nnewlines"
    assert got[3] == "zerowidth chars"
    con = duckdb.connect()
    for s, g in zip(samples, got):
        want = con.execute(
            f"SELECT {clean_text_sql('?')}", [s]).fetchone()[0]
        assert g == want, repr(s)


def test_salted_agg_equals_direct(spark):
    from duckdb_spatial_spark.operators.pipeline import salted_agg

    df = spark.createDataFrame(
        [(i % 3, i, float(i)) for i in range(1000)],
        "k long, v long, x double")
    got = {r.k: (r.n, r.s, r.mn, r.mx) for r in salted_agg(
        df, "k", {"n": (F.col("v"), "count"), "s": (F.col("v"), "sum"),
                  "mn": (F.col("x"), "min"), "mx": (F.col("x"), "max")},
        salt=8).collect()}
    want = {r.k: (r.n, r.s, r.mn, r.mx) for r in
            df.groupBy("k").agg(F.count("v").alias("n"),
                                F.sum("v").alias("s"),
                                F.min("x").alias("mn"),
                                F.max("x").alias("mx")).collect()}
    assert got == want


def test_salted_ops_tolerate_map_columns_and_spread(spark):
    """xxhash64 rejects MapType — the salt must skip map columns, not
    throw — and identical rows across partitions must still spread over
    more than one salt (partition-id mix-in)."""
    from duckdb_spatial_spark.operators.pipeline import (_salt_expr,
                                                         salted_agg,
                                                         salted_join)

    df = spark.createDataFrame(
        [(i % 3, i, {"a": i}) for i in range(300)],
        "k long, v long, m map<string,long>")
    got = {r.k: (r.n, r.s) for r in salted_agg(
        df, "k", {"n": (F.col("v"), "count"), "s": (F.col("v"), "sum")},
        salt=8).collect()}
    assert got == {0: (100, 14850), 1: (100, 14950), 2: (100, 15050)}

    right = spark.createDataFrame([(0, 7.0)], "k long, w double")
    j = salted_join(df.select("k", "v", "m"), right, ["k"], salt=4)
    assert j.count() == 100

    # identical rows spread across partitions → >1 distinct salt
    same = spark.createDataFrame(
        [("x", 1)] * 200, "k string, v long").repartition(8)
    nsalts = same.select(
        _salt_expr(same, 16).alias("s")).distinct().count()
    assert nsalts > 1, nsalts


def test_corpus_diff(spark):
    from duckdb_spatial_spark.operators.pipeline import corpus_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, t string")
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, "d")], "id long, t string")
    got = {r.id: r.status for r in
           corpus_diff(old, new, "id", "t").collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_minhash_incremental_index(spark, tmp_path):
    from duckdb_spatial_spark.operators.dedup import (jaccard_verify,
                                                      minhash_index_build,
                                                      minhash_index_query,
                                                      minhash_lsh_candidates)

    base = [(i, f"doc number {i} about spark batch window " * 3)
            for i in range(20)]
    batch1 = spark.createDataFrame(base, "doc_id long, text string")
    # batch2: ids 100+, half of them near-dups of batch1 texts
    b2 = [(100 + i, base[i][1] + " extra") for i in range(10)] + \
         [(200 + i, f"completely different content {i} " * 5)
          for i in range(5)]
    batch2 = spark.createDataFrame(b2, "doc_id long, text string")

    # persist the index as parquet and reload — the incremental contract
    idx_path = str(tmp_path / "mh_index")
    minhash_index_build(batch1, "doc_id", "text").write \
        .partitionBy("band").parquet(idx_path)
    index = spark.read.parquet(idx_path)

    cand = minhash_index_query(batch2, index, "doc_id", "text")
    allc = cand.collect()
    assert all(r.id_a >= 100 and r.id_b < 100 for r in allc)

    # verified pairs match running full LSH over the union, restricted
    # to cross-batch pairs
    union = batch1.unionByName(batch2)
    want = {
        (max(r.id_a, r.id_b), min(r.id_a, r.id_b))
        for r in jaccard_verify(
            minhash_lsh_candidates(union, "doc_id", "text"),
            union, "doc_id", "text", k=5, threshold=0.8).collect()
        if (r.id_a < 100) != (r.id_b < 100)
    }
    got = {
        (r.id_a, r.id_b)
        for r in jaccard_verify(
            cand, union, "doc_id", "text", k=5, threshold=0.8).collect()
    }
    assert got == want and len(got) > 0


def test_ann_recall_harness(spark, emb):
    from duckdb_spatial_spark.operators import (ann_lsh_topk,
                                                ann_bruteforce_topk)
    from duckdb_spatial_spark.operators.similarity import ann_recall

    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))

    def lsh_n(n):
        def f(df, queries, k):
            return ann_lsh_topk(df, queries, k, n_planes=n)
        return f

    def avg_recall(fn):
        r = ann_recall(emb, qs, fn, k=10).collect()
        assert len(r) == 5 and all(x.n_truth == 10 for x in r)
        return sum(x.recall for x in r) / len(r)

    # the knob the harness exists to expose: fewer planes → wider
    # buckets → recall rises toward 1 (at more candidate cost)
    r2, r8 = avg_recall(lsh_n(2)), avg_recall(lsh_n(8))
    assert 0.0 < r8 <= r2 <= 1.0
    assert r2 >= 0.5
    # the brute-force method evaluated against itself is perfect
    perfect = ann_recall(
        emb, qs, lambda df, q, k: ann_bruteforce_topk(df, q, k),
        k=10).collect()
    assert all(x.recall == 1.0 for x in perfect)


def test_salted_join_equals_plain_join(spark):
    from duckdb_spatial_spark.operators.pipeline import salted_join

    left = spark.createDataFrame(
        [(i, ["hot", "hot", "hot", "cold", "warm"][i % 5], float(i))
         for i in range(500)], "id long, k string, v double")
    right = spark.createDataFrame(
        [("hot", 1.0), ("cold", 2.0), ("missing", 9.0)], "k string, w double")
    for how in ("inner", "left"):
        got = sorted(map(tuple, salted_join(
            left, right, ["k"], salt=4, how=how).collect()))
        exp = sorted(map(tuple, left.join(right, ["k"], how).select(
            *salted_join(left, right, ["k"], salt=4, how=how).columns
        ).collect()))
        assert got == exp, how


def test_train_ivf_rejects_unbounded_collect(spark, emb):
    """sample=None/0 must raise — the train step's contract is a
    bounded driver-side collect at any corpus size."""
    import pytest

    from duckdb_spatial_spark.operators import train_ivf_centroids

    with pytest.raises(ValueError, match="sample"):
        train_ivf_centroids(emb, sample=None)
    with pytest.raises(ValueError, match="sample"):
        train_ivf_centroids(emb, sample=0)
