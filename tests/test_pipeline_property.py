"""Property tests for the corpus-prep tier: the Python kernels get full
hypothesis sweeps; Spark-level invariants run once per seeded random
corpus (a session job per hypothesis example would be prohibitive)."""

import random
from collections import Counter

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators.pipeline import _repetition_row

WORDS = st.lists(
    st.text(alphabet="abcxyz", min_size=1, max_size=4), min_size=0, max_size=40
)


def _reference_metrics(text, top_ns, dup_ns):
    """Straight joined-strings reference implementation."""
    out = []
    lines = [ln for ln in (text or "").split("\n") if ln.strip()]
    if lines:
        lc = Counter(lines)
        out.append(sum(c for c in lc.values() if c > 1) / len(lines))
        tot = sum(len(l) for l in lines)
        out.append(sum(len(l) * c for l, c in lc.items() if c > 1) / tot if tot else 0.0)
    else:
        out.extend([0.0, 0.0])
    norm = " ".join((text or "").lower().split())
    words = norm.split(" ") if norm else []
    L = len(norm)
    for n in top_ns:
        grams = [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]
        if not grams or L == 0:
            out.append(0.0)
            continue
        c = Counter(grams)
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append(best[1] * len(best[0]) / L)
    for n in dup_ns:
        grams = [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]
        if not grams or L == 0:
            out.append(0.0)
            continue
        c = Counter(grams)
        out.append(sum(len(g) * k for g, k in c.items() if k > 1) / L)
    return out


@settings(max_examples=150, deadline=None)
@given(WORDS, st.integers(1, 4), st.integers(1, 5))
def test_repetition_kernel_equals_reference(words, ntop, ndup):
    text = " ".join(words)
    got = _repetition_row(text, (ntop,), (ndup,))
    want = _reference_metrics(text, (ntop,), (ndup,))
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert abs(a - b) < 1e-12, (text, got, want)


@settings(max_examples=150, deadline=None)
@given(st.integers(1, 500), st.integers(2, 64), st.integers(0, 63))
def test_chunk_arithmetic_covers_all_words(n_words, max_tokens, overlap):
    """The n_chunks formula: chunks tile [0, n_words) with the declared
    overlap and the last chunk reaches the end."""
    if overlap >= max_tokens:
        return
    stride = max_tokens - overlap
    n_chunks = max((n_words - overlap + stride - 1) // stride, 1)
    spans = [(k * stride, min(k * stride + max_tokens, n_words))
             for k in range(n_chunks)]
    assert spans[0][0] == 0
    assert spans[-1][1] == n_words
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert b0 <= a1  # contiguous or overlapping
        assert b0 == a1 - overlap  # declared overlap between full chunks


def test_spark_pipeline_invariants(spark):
    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 60))))
        for i in range(300)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    # hash_sample: monotone — a smaller fraction's sample is a subset
    from duckdb_spatial_spark.operators.pipeline import (hash_sample,
                                                         pack_sequences,
                                                         paragraph_dedup)

    s_small = {r.doc_id for r in hash_sample(df, "doc_id", 0.2, seed=5).collect()}
    s_big = {r.doc_id for r in hash_sample(df, "doc_id", 0.6, seed=5).collect()}
    assert s_small <= s_big

    # pack_sequences: offsets strictly ordered by id, total conserved
    toks = df.select("doc_id", F.size(F.split("text", " ")).alias("t"))
    packed = sorted((r.doc_id, r.start_off, r.t) for r in
                    pack_sequences(toks, "doc_id", "t", 64).collect())
    acc = 0
    for _id, so, t in packed:
        assert so == acc
        acc += t

    # paragraph_dedup: kept paragraphs globally unique; idempotent
    built = df.select(
        "doc_id",
        F.concat_ws("\n\n", F.substring("text", 1, 20), F.lit("boiler plate"),
                    F.substring("text", 21, 40)).alias("text"))
    once = paragraph_dedup(built)
    paras = [p for r in once.collect() for p in r.text.split("\n\n")]
    assert len(paras) == len(set(paras))
    twice = paragraph_dedup(once.select("doc_id", "text"))
    a = sorted((r.doc_id, r.text) for r in once.select("doc_id", "text").collect())
    b = sorted((r.doc_id, r.text) for r in twice.select("doc_id", "text").collect())
    assert a == b
