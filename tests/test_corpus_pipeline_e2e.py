"""End-to-end corpus pipeline: the full chain a training-data team runs,
operator by operator, over the driver testdata — language ID → quality +
repetition filtering → paragraph dedup → near-dup dedup → decontamination
→ stratified mixing → chunking → packing → WebDataset shards. Asserts the
corpus shrinks monotonically where it must, stays deterministic, and the
final shards round-trip."""

import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_full_corpus_pipeline(spark, tmp_path):
    from duckdb_spatial_spark.operators import (dedup_pipeline, textops)
    from duckdb_spatial_spark.operators.pipeline import (
        chunk_documents, decontaminate, gopher_repetition_filter,
        pack_sequences, paragraph_dedup, stratified_sample)
    from duckdb_spatial_spark.sources.webdataset import (
        group_samples, st_read_webdataset, st_write_webdataset)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n0 = docs.count()
    assert n0 > 0

    # 1. language ID + quality floor
    scored = docs.select(
        "*",
        textops.language_id_ngram(F.col("text")).alias("lang_guess"),
        textops.quality_score(F.col("text")).alias("q"),
    ).filter(F.col("q") > 0.2)
    n1 = scored.count()
    assert 0 < n1 <= n0

    # 2. repetition filter (thresholds loose enough for word-soup docs)
    kept = gopher_repetition_filter(
        scored, thresholds={"dup_5gram_char_frac": 1.0,
                            "dup_10gram_char_frac": 1.0,
                            "top_2gram_char_frac": 1.0,
                            "top_3gram_char_frac": 1.0,
                            "top_4gram_char_frac": 1.0})
    n2 = kept.count()
    assert 0 < n2 <= n1

    # 3. paragraph dedup over synthesized 2-para docs
    built = kept.select(
        "doc_id", "lang",
        F.concat_ws("\n\n", F.col("text"), F.lit("shared footer")).alias("text"))
    deduped = paragraph_dedup(built, "doc_id", "text")
    n3 = deduped.count()
    assert 0 < n3 <= n2
    # only ONE copy of the footer survives corpus-wide
    footer_copies = deduped.filter(F.col("text").contains("shared footer")).count()
    assert footer_copies == 1

    # 4. near-dup dedup (one-call pipeline)
    uniq = dedup_pipeline(deduped.select("doc_id", "text"), "doc_id", "text",
                          method="minhash", threshold=0.9, num_hashes=4,
                          bands=2, k=4)
    n4 = uniq.count()
    assert 0 < n4 <= n3

    # 5. decontamination against a fake eval set leaked from the corpus
    bench = deduped.filter(F.col("doc_id") % 97 == 0).select(
        "doc_id",
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, 10)).alias("text"))
    clean = decontaminate(uniq.join(deduped.select("doc_id", "lang"), "doc_id"),
                          bench, n=8, mode="drop")
    n5 = clean.count()
    assert 0 < n5 <= n4

    # 6. deterministic per-language mix (run twice → identical)
    mixed = stratified_sample(clean, "doc_id", "lang",
                              {"en": 0.9, "de": 0.9, "fr": 0.9, "es": 0.9,
                               "zh": 0.9}, seed=11)
    ids_a = sorted(r.doc_id for r in mixed.select("doc_id").collect())
    ids_b = sorted(r.doc_id for r in mixed.select("doc_id").collect())
    assert ids_a == ids_b and 0 < len(ids_a) <= n5

    # 7. chunk → 8. pack
    chunks = chunk_documents(mixed, max_tokens=32, overlap=8)
    chunks = chunks.withColumn(
        "chunk_key", F.concat_ws("_", F.col("doc_id"), F.col("chunk_idx")))
    packed = pack_sequences(
        chunks.select("chunk_key", "doc_id", "chunk_idx", "chunk_text",
                      "chunk_tokens"),
        "chunk_key", "chunk_tokens", capacity=128)
    total_tokens = packed.agg(F.sum("chunk_tokens")).collect()[0][0]
    last = packed.orderBy(F.desc("start_off")).first()
    assert last.start_off + last.chunk_tokens == total_tokens

    # 9. ship as WebDataset shards and round-trip
    out = str(tmp_path / "final_wds")
    payload = packed.select(
        "chunk_key",
        F.encode("chunk_text", "UTF-8").alias("txt"),
        F.encode(F.col("bin_id").cast("string"), "UTF-8").alias("bin"))
    st_write_webdataset(payload, out, "chunk_key",
                        {"txt": "txt", "bin": "bin.id"}, num_shards=3)
    back = group_samples(st_read_webdataset(spark, out))
    assert back.count() == packed.count()
    assert back.agg(F.sum("n_parts")).collect()[0][0] == 2 * packed.count()
