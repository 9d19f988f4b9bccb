"""BPE tokenization tier: distributed word frequencies, deterministic merge
training, broadcast apply — checked against an independent naive reference
implementation."""
import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators.tokenize import (apply_bpe,
                                                     bpe_encode_word,
                                                     bpe_token_count,
                                                     merges_from_df,
                                                     merges_to_df, train_bpe,
                                                     word_frequencies)

_END = "</w>"


def naive_apply(word, merges):
    """Reference BPE apply: walk the merge list IN RANK ORDER, replacing
    every adjacent occurrence (a different control flow from the library's
    best-rank-first loop — but provably the same fixpoint)."""
    sym = list(word) + [_END]
    for a, b in merges:
        i = 0
        while i < len(sym) - 1:
            if sym[i] == a and sym[i + 1] == b:
                sym[i:i + 2] = [a + b]
            else:
                i += 1
    return sym


CORPUS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wider wide widest",
    "low new wide lower newer",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")


def test_word_frequencies(spark, docs):
    wf = {r.word: r.freq for r in
          word_frequencies(docs, "text").collect()}
    assert wf["low"] == 4 and wf["new"] == 5 and wf["wider"] == 1
    top = word_frequencies(docs, "text", max_words=2).collect()
    assert [(r.word, r.freq) for r in top] == [("new", 5), ("low", 4)]


def test_train_matches_reference_apply(spark, docs):
    wf = [(r.word, r.freq) for r in word_frequencies(docs, "text").collect()]
    merges = train_bpe(wf, num_merges=30)
    assert len(merges) > 0
    ranks = {p: i for i, p in enumerate(merges)}
    for word in ("low", "lowest", "newer", "widest", "unseen"):
        assert bpe_encode_word(word, ranks) == naive_apply(word, merges), word


def test_apply_bpe_distributed(spark, docs):
    wf = [(r.word, r.freq) for r in word_frequencies(docs, "text").collect()]
    merges = train_bpe(wf, num_merges=30)
    got = {r.doc_id: r.tokens for r in
           apply_bpe(docs, "text", merges).collect()}
    for i, line in enumerate(CORPUS):
        want = [t for w in line.lower().split() for t in naive_apply(w, merges)]
        assert got[i] == want, i
    # counts path agrees with array sizes
    n = {r.doc_id: r.n_tokens for r in
         bpe_token_count(docs, "text", merges).collect()}
    assert all(n[i] == len(got[i]) for i in got)
    # frequent whole words collapse to single tokens
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe_encode_word("low", ranks) == ["low" + _END]
    assert bpe_encode_word("new", ranks) == ["new" + _END]


def test_merges_roundtrip_and_determinism(spark, docs):
    wf = [(r.word, r.freq) for r in word_frequencies(docs, "text").collect()]
    m1 = train_bpe(wf, num_merges=20)
    m2 = train_bpe(list(reversed(wf)), num_merges=20)
    assert m1 == m2  # input order must not matter
    back = merges_from_df(merges_to_df(spark, m1))
    assert back == m1


def test_train_on_real_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wf = [(r.word, r.freq)
          for r in word_frequencies(docs, "text", max_words=500).collect()]
    merges = train_bpe(wf, num_merges=100)
    ranks = {p: i for i, p in enumerate(merges)}
    out = apply_bpe(docs.limit(50), "text", merges)
    rows = out.select(
        F.size("tokens").alias("n"),
        (F.length(F.col("text")) > 0).alias("nonempty")).collect()
    assert all(r.n > 0 for r in rows if r.nonempty)
    # spot-check a handful of words against the reference
    for r in docs.limit(5).collect():
        for w in r.text.lower().split()[:10]:
            assert bpe_encode_word(w, ranks) == naive_apply(w, merges)


# ---------------------------------------------------------------------------
# unigram LM tokenizer (Kudo 2018 — hard-EM variant)
# ---------------------------------------------------------------------------

def _toy_wf():
    # "token"-like corpus: frequent multi-char units should become pieces
    words = (["tokenization"] * 50 + ["tokens"] * 80 + ["token"] * 100
             + ["ization"] * 40 + ["nation"] * 30 + ["nice"] * 20)
    from collections import Counter
    return sorted(Counter(words).items())


def test_unigram_train_keeps_coverage_and_size():
    from duckdb_spatial_spark.operators.tokenize import train_unigram

    logp = train_unigram(_toy_wf(), vocab_size=30, max_piece_len=6)
    chars = set("".join(w for w, _ in _toy_wf()))
    assert chars <= set(p for p in logp if len(p) == 1)
    assert len(logp) <= 30 + len(chars)
    assert any(len(p) > 1 for p in logp)  # learned multi-char pieces
    # probabilities normalized at the last M step: sum(exp) ≈ 1 pre-prune
    # is not guaranteed post-prune, but every logp must be finite
    import math as m
    assert all(m.isfinite(v) for v in logp.values())


def test_unigram_segmentation_roundtrip_and_determinism():
    from duckdb_spatial_spark.operators.tokenize import (_viterbi_segment,
                                                         train_unigram)

    logp = train_unigram(_toy_wf(), vocab_size=30, max_piece_len=6)
    floor = min(logp.values()) - 10.0
    for w in ["tokenization", "tokens", "renationalization", "xyzzy"]:
        toks = _viterbi_segment(w, logp, floor)
        assert "".join(toks) == w                       # exact coverage
        assert toks == _viterbi_segment(w, logp, floor)  # deterministic
    # frequent word segments into few pieces
    assert len(_viterbi_segment("token", logp, floor)) <= 2


def test_apply_unigram_spark(spark):
    from duckdb_spatial_spark.operators.tokenize import (apply_unigram,
                                                         train_unigram)

    logp = train_unigram(_toy_wf(), vocab_size=30, max_piece_len=6)
    df = spark.createDataFrame(
        [(1, "Token tokenization NATION"), (2, ""), (3, None)],
        "doc_id long, text string")
    out = {r.doc_id: r.tokens
           for r in apply_unigram(df, "text", logp).collect()}
    assert "".join(out[1]).startswith("token")
    assert "".join(out[1]) == "tokentokenizationnation"
    assert out[2] == []
    assert out[3] == []


# --------------------------------------------------------------------- WP

def test_wordpiece_train_scores_likelihood_not_count():
    from duckdb_spatial_spark.operators.tokenize import train_wordpiece

    # 'xq' appears 5 times but x,q are rare → high score; 'ee' appears 8
    # times but e is everywhere → low score. WordPiece must merge xq
    # before ee (BPE, scoring raw counts, would do the opposite).
    wf = [("xq", 5), ("seed", 4), ("week", 4), ("peel", 4), ("exe", 4)]
    v = train_wordpiece(wf, vocab_size=len(set("xqsdwkple")) * 2 + 1)
    assert "xq" in v


def test_wordpiece_greedy_longest_match_and_fallback():
    from duckdb_spatial_spark.operators.tokenize import \
        wordpiece_encode_word

    vocab = {"un", "##able", "##abl", "##e", "able", "a", "##b", "##l",
             "##a", "u", "##n"}
    # longest-first: un + ##able (not un ##abl ##e)
    assert wordpiece_encode_word("unable", vocab) == ["un", "##able"]
    # OOV chars fall back to single-char pieces; concat reproduces word
    toks = wordpiece_encode_word("zebra", vocab)
    assert "".join(t[2:] if t.startswith("##") else t for t in toks) \
        == "zebra"


def test_wordpiece_apply_spark_coverage(spark):
    from duckdb_spatial_spark.operators.tokenize import (apply_wordpiece,
                                                         train_wordpiece,
                                                         word_frequencies)

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the lazy dog the fox")],
        "id long, text string")
    wf = [(r.word, r.freq)
          for r in word_frequencies(df, "text", max_words=100).collect()]
    vocab = train_wordpiece(wf, vocab_size=40)
    toks = apply_wordpiece(df, "text", vocab).collect()
    for r in toks:
        rebuilt = "".join(
            t[2:] if t.startswith("##") else t for t in r["tokens"])
        assert rebuilt == r["text"].replace(" ", "")


def test_wordpiece_hash_words_roundtrip():
    """Review regression: literal '#' words (markdown headings) must not
    mint a word-initial piece spelled '##…' (collides with the
    continuation prefix) and must still round-trip losslessly."""
    from duckdb_spatial_spark.operators.tokenize import (
        train_wordpiece, wordpiece_encode_word)

    wf = [("##", 50), ("###", 40), ("#x", 30), ("hello", 10)]
    v = train_wordpiece(wf, vocab_size=40)
    for w in ("##", "###", "#x#", "####hello"):
        toks = wordpiece_encode_word(w, set(v))
        rebuilt = "".join(t[2:] if t.startswith("##") else t for t in toks)
        assert rebuilt == w, (w, toks)


def test_bpe_doc_tokens_sql_matches_python(spark):
    """The unrolled-CTE DuckDB twin must replay train+apply exactly —
    including greedy left-to-right runs ('a a a a' style) and docs
    shorter than one merge."""
    import duckdb

    from duckdb_spatial_spark.operators.tokenize import (
        apply_bpe, bpe_doc_tokens_sql, train_bpe, word_frequencies)

    rows = [
        (1, "aaaa aaaa aa banana bandana"),
        (2, "aaaa aa aa banana banana band"),
        (3, "x"),
        (4, "  "),
        (5, "banana aaaa band bandana na na na"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wf = [(r.word, r.freq)
          for r in word_frequencies(df, "text", max_words=5000).collect()]
    merges = train_bpe(wf, num_merges=30)
    tok = apply_bpe(df, "text", merges)
    from pyspark.sql import functions as F
    want = {r["doc_id"]: (r["nt"], r["ft"]) for r in tok.select(
        "doc_id", F.size("tokens").alias("nt"),
        F.get("tokens", 0).alias("ft")).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    got = {d: (n, f) for d, n, f in con.execute(
        bpe_doc_tokens_sql("docs", "text", "doc_id",
                           num_merges=30, max_words=5000)).fetchall()}
    assert got == want


def test_bpe_doc_tokens_sql_respects_max_words(spark):
    """max_words truncation must hit the same (freq DESC, word ASC)
    boundary in both engines."""
    import duckdb

    from duckdb_spatial_spark.operators.tokenize import (
        apply_bpe, bpe_doc_tokens_sql, train_bpe, word_frequencies)

    rows = [(1, "pear pear pear plum plum apple"),
            (2, "pear plum peach apple apple grape")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wf = [(r.word, r.freq)
          for r in word_frequencies(df, "text", max_words=3).collect()]
    merges = train_bpe(wf, num_merges=20)
    tok = apply_bpe(df, "text", merges)
    from pyspark.sql import functions as F
    want = {r["doc_id"]: r["nt"] for r in
            tok.select("doc_id", F.size("tokens").alias("nt")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    got = {d: n for d, n, _f in con.execute(
        bpe_doc_tokens_sql("docs", "text", "doc_id",
                           num_merges=20, max_words=3)).fetchall()}
    assert got == want
