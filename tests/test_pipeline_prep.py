"""Tests for operators/pipeline.py — decontamination, deterministic
sampling, PII redaction, paragraph dedup."""

import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators.pipeline import (
    PII_PATTERNS,
    benchmark_ngrams,
    decontaminate,
    hash_sample,
    paragraph_dedup,
    pii_count,
    redact_pii,
    redact_sql,
    sample_predicate_sql,
    stratified_predicate_sql,
    stratified_sample,
    word_ngrams,
)


# ---------------------------------------------------------------- ngrams

def test_word_ngrams_basic(spark):
    df = spark.createDataFrame([("a b c d",)], ["t"])
    grams = df.select(word_ngrams(F.col("t"), 2).alias("g")).head()[0]
    assert grams == ["a b", "b c", "c d"]


def test_word_ngrams_short_doc_single_gram(spark):
    df = spark.createDataFrame([("only two",)], ["t"])
    grams = df.select(word_ngrams(F.col("t"), 8).alias("g")).head()[0]
    assert grams == ["only two"]


def test_word_ngrams_normalizes_whitespace_case(spark):
    df = spark.createDataFrame([("  A   b\tC ",)], ["t"])
    grams = df.select(word_ngrams(F.col("t"), 2).alias("g")).head()[0]
    assert grams == ["a b", "b c"]


# ------------------------------------------------------- decontaminate

@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "a completely unrelated document about nothing at all"),
        ],
        ["doc_id", "text"],
    )


def test_decontaminate_drop_and_flag(spark, corpus):
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps"), (101, "five dozen liquor jugs")],
        ["doc_id", "text"],
    )
    clean = decontaminate(corpus, bench, n=4, mode="drop")
    assert sorted(r.doc_id for r in clean.collect()) == [3]
    flagged = decontaminate(corpus, bench, n=4, mode="flag")
    got = {r.doc_id: r.contaminated for r in flagged.collect()}
    assert got == {1: True, 2: True, 3: False}


def test_decontaminate_no_overlap_keeps_all(spark, corpus):
    bench = spark.createDataFrame([(9, "zz yy xx ww")], ["doc_id", "text"])
    assert decontaminate(corpus, bench, n=4).count() == 3


def test_benchmark_ngrams_distinct(spark):
    bench = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], ["doc_id", "text"]
    )
    grams = {r.gram for r in benchmark_ngrams(bench, n=2).collect()}
    assert grams == {"a b", "b a", "b c"}


# ------------------------------------------------------------ sampling

def test_hash_sample_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = sorted(r.k for r in hash_sample(df, "k", 0.3, seed=7).collect())
    b = sorted(
        r.k for r in hash_sample(df.repartition(13), "k", 0.3, seed=7).collect()
    )
    assert a == b
    assert 0.2 < len(a) / 2000 < 0.4


def test_hash_sample_matches_sql_oracle(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "k")
    got = sorted(r.k for r in hash_sample(df, "k", 0.25, seed=3).collect())
    pred = sample_predicate_sql("k", 0.25, seed=3)
    want = [
        r[0]
        for r in duckdb.sql(
            f"SELECT k FROM range(0,500) t(k) WHERE {pred} ORDER BY k"
        ).fetchall()
    ]
    assert got == want


def test_stratified_sample_fractions(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(4000)]
    df = spark.createDataFrame(rows, ["k", "lang"])
    out = stratified_sample(df, "k", "lang", {"en": 0.5, "de": 0.1}, seed=1)
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 800 < counts["en"] < 1200
    assert 100 < counts["de"] < 320


def test_stratified_sample_matches_sql_oracle(spark):
    rows = [(i, "en" if i % 3 else "fr") for i in range(600)]
    df = spark.createDataFrame(rows, ["k", "lang"])
    got = sorted(r.k for r in
                 stratified_sample(df, "k", "lang", {"en": 0.4, "fr": 0.9}, seed=5).collect())
    pred = stratified_predicate_sql("k", "lang", {"en": 0.4, "fr": 0.9}, seed=5)
    want = [
        r[0]
        for r in duckdb.sql(
            "SELECT k FROM (SELECT k, CASE WHEN k % 3 <> 0 THEN 'en' ELSE 'fr' END AS lang "
            f"FROM range(0,600) t(k)) WHERE {pred} ORDER BY k"
        ).fetchall()
    ]
    assert got == want


def test_stratified_default_fraction_zero(spark):
    df = spark.createDataFrame([(1, "xx")], ["k", "lang"])
    assert stratified_sample(df, "k", "lang", {"en": 1.0}, seed=0).count() == 0


# ------------------------------------------------------------- PII

PII_TEXT = (
    "mail me at jane.doe+spam@mail.example.org or call +1-555-867-5309; "
    "server at 192.168.0.17 and 8.8.8.8, not 1234.5.6.7 though"
)


def test_redact_pii_spark(spark):
    df = spark.createDataFrame([(PII_TEXT,)], ["t"])
    out = df.select(
        redact_pii(F.col("t")).alias("r"),
        pii_count(F.col("t"), "email").alias("ne"),
        pii_count(F.col("t"), "ipv4").alias("ni"),
        pii_count(F.col("t"), "phone").alias("np"),
    ).head()
    assert "@" not in out.r
    assert "192.168" not in out.r
    assert "867" not in out.r
    assert (out.ne, out.ni, out.np) == (1, 2, 1)
    assert out.r.count("[PII]") == 4


def test_redact_pii_matches_duckdb(spark):
    df = spark.createDataFrame([(PII_TEXT,)], ["t"])
    got = df.select(redact_pii(F.col("t")).alias("r")).head().r
    want = duckdb.sql(
        f"SELECT {redact_sql('t')} FROM (SELECT '{PII_TEXT}' AS t)"
    ).fetchone()[0]
    assert got == want


def test_pii_patterns_re2_safe():
    # no backreferences / lookaround, so the same string is valid RE2
    for pat in PII_PATTERNS.values():
        assert "(?=" not in pat and "(?!" not in pat and "\\1" not in pat
        duckdb.sql(f"SELECT regexp_matches('x', '{pat}')")


# ---------------------------------------------------- paragraph dedup

def test_paragraph_dedup_keep_first(spark):
    boiler = "subscribe to our newsletter"
    df = spark.createDataFrame(
        [
            (1, f"intro one\n\n{boiler}\n\nbody one"),
            (2, f"intro two\n\n{boiler}\n\nbody two"),
            (3, f"{boiler}"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: (r.text, r.n_paragraphs) for r in
           paragraph_dedup(df).collect()}
    assert out[1] == (f"intro one\n\n{boiler}\n\nbody one", 3)
    assert out[2] == ("intro two\n\nbody two", 2)
    assert 3 not in out  # lost its only (duplicate) paragraph


def test_paragraph_dedup_strict_mode(spark):
    boiler = "cookie banner"
    df = spark.createDataFrame(
        [(1, f"a\n\n{boiler}"), (2, f"b\n\n{boiler}")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.text for r in
           paragraph_dedup(df, keep_first=False).collect()}
    assert out == {1: "a", 2: "b"}


def test_paragraph_dedup_preserves_order_and_columns(spark):
    df = spark.createDataFrame(
        [(5, "z\n\ny\n\nx", "en")], ["doc_id", "text", "lang"]
    )
    r = paragraph_dedup(df).head()
    assert r.text == "z\n\ny\n\nx" and r.lang == "en" and r.n_paragraphs == 3


# ---------------------------------------------------- repetition metrics

def test_repetition_metrics_values(spark):
    from duckdb_spatial_spark.operators.pipeline import repetition_metrics

    # "a b a b a b": top 2-gram "a b" occurs 3x (len 3), norm len 11
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x\ny\nx\nz"), (3, "unique words only here")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in
           repetition_metrics(df, top_ns=(2,), dup_ns=(2,)).collect()}
    r1 = out[1]
    assert abs(r1.top_2gram_char_frac - 3 * 3 / 11) < 1e-12
    # duplicated 2-grams: "a b" 3x (9 chars) + "b a" 2x (6 chars) → 15/11
    assert abs(r1.dup_2gram_char_frac - 15 / 11) < 1e-12
    r2 = out[2]
    assert abs(r2.dup_line_frac - 2 / 4) < 1e-12      # two 'x' lines of 4
    assert abs(r2.dup_line_char_frac - 2 / 4) < 1e-12
    r3 = out[3]
    assert r3.dup_2gram_char_frac == 0.0
    assert r3.dup_line_frac == 0.0


def test_gopher_filter_drops_repetitive(spark):
    from duckdb_spatial_spark.operators.pipeline import gopher_repetition_filter

    spammy = " ".join(["buy cheap pills now"] * 30)
    # long enough that one n-gram's chars are a small fraction (the Gopher
    # top-ngram rules presume multi-hundred-word documents)
    clean = " ".join(f"tok{i}ua" for i in range(300))
    df = spark.createDataFrame(
        [(1, spammy), (2, clean)], ["doc_id", "text"]
    )
    kept = gopher_repetition_filter(df)
    assert [r.doc_id for r in kept.collect()] == [2]


def test_repetition_keeps_other_columns(spark):
    from duckdb_spatial_spark.operators.pipeline import repetition_metrics

    df = spark.createDataFrame([(7, "a b c", "en")], ["doc_id", "text", "lang"])
    r = repetition_metrics(df).head()
    assert r.lang == "en" and r.doc_id == 7


# ---------------------------------------------------- sequence packing

def test_pack_sequences_matches_serial_cumsum(spark):
    from duckdb_spatial_spark.operators.pipeline import pack_sequences

    rows = [(i, 10 + (i * 7) % 23) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "tokens"])
    out = {r.doc_id: (r.start_off, r.bin_id, r.spans_boundary)
           for r in pack_sequences(df, "doc_id", "tokens", 64, num_partitions=7).collect()}
    acc = 0
    for i, tok in rows:
        want_bin = acc // 64
        spans = (acc // 64) != ((acc + tok - 1) // 64)
        assert out[i] == (acc, want_bin, spans), (i, out[i], (acc, want_bin, spans))
        acc += tok


def test_pack_sequences_partition_invariant(spark):
    from duckdb_spatial_spark.operators.pipeline import pack_sequences

    rows = [(i, 5 + i % 11) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "tokens"])
    a = sorted((r.doc_id, r.start_off) for r in
               pack_sequences(df, "doc_id", "tokens", 100, num_partitions=2).collect())
    b = sorted((r.doc_id, r.start_off) for r in
               pack_sequences(df.repartition(13), "doc_id", "tokens", 100,
                              num_partitions=9).collect())
    assert a == b


def test_pack_sequences_matches_sql_window(spark):
    from duckdb_spatial_spark.operators.pipeline import pack_sequences

    rows = [(i, 1 + (i * 13) % 37) for i in range(150)]
    df = spark.createDataFrame(rows, ["doc_id", "tokens"])
    got = sorted((r.doc_id, r.start_off, r.bin_id) for r in
                 pack_sequences(df, "doc_id", "tokens", 50, num_partitions=5).collect())
    duckdb.sql("CREATE OR REPLACE TABLE t(doc_id BIGINT, tokens BIGINT)")
    duckdb.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = [tuple(r) for r in duckdb.sql("""
        SELECT doc_id,
               sum(tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - tokens AS so,
               CAST(floor((sum(tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - tokens) / 50.0) AS BIGINT)
        FROM t ORDER BY doc_id
    """).fetchall()]
    assert got == want


# ---------------------------------------------------- chunking / mixing

def test_chunk_documents_windows(spark):
    from duckdb_spatial_spark.operators.pipeline import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, words), (2, "short doc")], ["doc_id", "text"])
    out = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_text)
        for r in chunk_documents(df, max_tokens=4, overlap=1).collect()
    )
    # stride 3: starts 0,3,6 for 10 words → ceil((10-1)/3)=3 chunks
    assert out == [
        (1, 0, "w0 w1 w2 w3"),
        (1, 1, "w3 w4 w5 w6"),
        (1, 2, "w6 w7 w8 w9"),
        (2, 0, "short doc"),
    ]


def test_chunk_documents_matches_duckdb(spark):
    from duckdb_spatial_spark.operators.pipeline import (
        chunk_documents, chunk_documents_sql)

    texts = [(i, " ".join(f"t{i}x{j}" for j in range(5 + i * 3))) for i in range(8)]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = sorted((r.doc_id, r.chunk_idx, r.chunk_text) for r in
                 chunk_documents(df, max_tokens=6, overlap=2).collect())
    duckdb.sql("CREATE OR REPLACE TABLE cd(doc_id BIGINT, text VARCHAR)")
    duckdb.executemany("INSERT INTO cd VALUES (?, ?)", texts)
    expr = chunk_documents_sql(6, 2)
    want = sorted(tuple(r) for r in duckdb.sql(f"""
        SELECT doc_id, c.chunk_idx, c.chunk_text
        FROM (SELECT doc_id, unnest({expr}) AS c FROM cd)
    """).fetchall())
    assert got == want


def test_temperature_mix_balances(spark):
    from duckdb_spatial_spark.operators.pipeline import temperature_mix

    rows = [(i, "big" if i < 9000 else "small") for i in range(10000)]
    df = spark.createDataFrame(rows, ["k", "src"])
    out, fr = temperature_mix(df, "k", "src", target_rows=2000, alpha=0.5, seed=3)
    counts = {r.src: r.n for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # sqrt weighting: big keeps 9000*f_b ≈ 2000*0.75, small ≈ 2000*0.25
    assert 1300 < counts["big"] < 1700
    assert 350 < counts["small"] < 650
    assert abs(fr["big"] * 9000 + fr["small"] * 1000 - 2000) < 1e-6


def test_temperature_mix_caps_fraction_at_one(spark):
    from duckdb_spatial_spark.operators.pipeline import temperature_mix

    rows = [(i, "a" if i < 990 else "b") for i in range(1000)]
    df = spark.createDataFrame(rows, ["k", "src"])
    out, fr = temperature_mix(df, "k", "src", target_rows=900, alpha=0.5)
    assert fr["b"] == 1.0  # tiny source fully kept
    assert out.filter("src = 'b'").count() == 10


def test_bloom_filter_semantics(spark):
    from duckdb_spatial_spark.operators.bloom import (bloom_might_contain,
                                                      build_bloom)

    keys = spark.createDataFrame(
        [(f"key-{i}",) for i in range(2000)], "k string")
    bloom = build_bloom(keys, "k", 2000, fpp=0.01)
    # no false negatives: every inserted key passes
    hits = bloom_might_contain(keys, "k", bloom).filter("might").count()
    assert hits == 2000
    # false-positive rate near fpp on a disjoint probe set
    probes = spark.createDataFrame(
        [(f"other-{i}",) for i in range(5000)], "k string")
    fp = bloom_might_contain(probes, "k", bloom).filter("might").count()
    assert fp / 5000 < 0.05


def test_decontaminate_bloom_equals_exact(spark):
    import pyspark.sql.functions as F
    from duckdb_spatial_spark.operators.pipeline import decontaminate

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 17 == 0).select(
        "doc_id",
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 10))
        .alias("text"))
    a = set(r.doc_id for r in
            decontaminate(docs, bench, n=8).select("doc_id").collect())
    b = set(r.doc_id for r in
            decontaminate(docs, bench, n=8, bloom_fpp=0.01)
            .select("doc_id").collect())
    assert a == b and 0 < len(a) < docs.count()


def test_decontaminate_flag_projection_schema_stable_across_paths(spark):
    """mode='flag' + flag_projection must return the SAME projected
    (id, carry, contaminated) schema and values on EVERY path: the
    literal-bloom fast path, the distributed-bloom fallback (benchmark
    over the plan-literal cap — forced here with a tiny fpp so cap_items
    shrinks below the benchmark size), and the plain broadcast path
    (round-8 review: the fallback silently widened back to df.*)."""
    from duckdb_spatial_spark.operators import pipeline as pl

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps", 25),
         (2, "pack my box with five dozen", 27),
         (3, "unrelated text about nothing", 28)],
        ["doc_id", "text", "n_chars"])
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps")], ["doc_id", "text"])

    def run(**kw):
        out = pl.decontaminate(corpus, bench, n=4, mode="flag",
                               flag_projection=["n_chars"], **kw)
        assert out.columns == ["doc_id", "n_chars", "contaminated"], kw
        return sorted(map(tuple, out.collect()))

    plain = run()                                # broadcast path
    lit = run(bloom_fpp=0.01)                    # literal-bloom path
    # shrink the literal cap below the benchmark gram count to force the
    # distributed-bloom fallback
    import duckdb_spatial_spark.operators.pipeline as pmod
    import duckdb_spatial_spark.operators.bloom as bmod
    old = bmod.LITERAL_BLOOM_MAX_BITS
    try:
        bmod.LITERAL_BLOOM_MAX_BITS = 64
        pmod_fallback = run(bloom_fpp=0.01)      # distributed path
    finally:
        bmod.LITERAL_BLOOM_MAX_BITS = old
    assert plain == lit == pmod_fallback
    assert [r[2] for r in plain] == [True, False, False]


def test_streaming_cluster_auto_compact_bounds_file_count(spark, tmp_path):
    """Hilbert-side twin of the zorder auto-compact pin: 12 micro-batches
    with auto_compact_files=4 may not accumulate 12 generation files."""
    import glob

    from pyspark.sql import functions as F

    from duckdb_spatial_spark.streaming import streaming_cluster_append

    df = spark.range(1200).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("double").alias("x"),
        ((F.col("id") * 31) % 89).cast("double").alias("y"))
    src = str(tmp_path / "src")
    df.repartition(12).write.parquet(src)
    path = str(tmp_path / "h")
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = streaming_cluster_append(stream, path, "x", "y",
                                 extent=(0.0, 0.0, 97.0, 89.0),
                                 checkpoint=str(tmp_path / "ckpt"),
                                 auto_compact_files=4)
    q.awaitTermination()
    n_files = len(glob.glob(path + "/*.parquet"))
    assert n_files <= 5, f"auto-compact did not bound files: {n_files}"
    back = spark.read.parquet(path)
    assert back.count() == 1200
    assert back.agg(F.sum("k")).collect()[0][0] == sum(range(1200))
