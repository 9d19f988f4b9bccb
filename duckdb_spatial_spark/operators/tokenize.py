"""BPE tokenization tier — vocabulary induction and tokenization at corpus
scale (the step between a cleaned corpus and example packing in an LLM
training-data pipeline). Classic byte-pair-encoding per Sennrich et al.
2016 (public algorithm).

Spark-first split of work (the same train/apply architecture as the IVF
ANN tier, operators/similarity.py):

- **word_frequencies / vocab induction** is the distributed part: one
  groupBy-count shuffle over the corpus, heavy-hitter truncation to a
  bounded word-frequency table. At 100 TB the top ~1M word forms carry
  ~99.9% of token mass, so the merge-training input is bounded regardless
  of corpus size.
- **train_bpe** runs the merge loop on that bounded table driver-side
  (O(merges × unique_words) with incremental pair counts — the same
  locality every production BPE trainer uses; a distributed pass per merge
  would be 10k barrier-synchronized shuffles for no added statistics).
- **apply_bpe** is embarrassingly parallel: merge ranks broadcast once,
  Arrow-batched pandas UDF tokenizes with a per-batch word→tokens memo
  (Zipf makes the memo hit rate ~95%+ on natural text).

No external deps; tokenizer state (merges) round-trips through a plain
DataFrame so it can be persisted as parquet like the IVF centroids.
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "word_frequencies", "train_bpe", "apply_bpe", "bpe_token_count",
    "bpe_encode_word", "merges_to_df", "merges_from_df",
]

_END = "</w>"  # Sennrich end-of-word marker


def normalized_words(text: Column) -> Column:
    """Lowercased whitespace words — the same normalization the dedup tier
    uses, shared here so vocab and corpus agree."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def word_frequencies(
    df: DataFrame,
    text_col: str,
    max_words: Optional[int] = 1_000_000,
) -> DataFrame:
    """Distributed word-frequency table (word, freq), heavy-hitter
    truncated to ``max_words`` by (freq DESC, word ASC) — deterministic.
    One explode + one groupBy shuffle; partial aggregation makes the
    shuffle O(unique words per partition), not O(tokens)."""
    w = (
        df.select(F.explode(normalized_words(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    if max_words is not None:
        # top-N by a total order — orderBy+limit lets Spark run a
        # TakeOrdered (per-partition heap + driver merge), no full sort
        w = w.orderBy(F.col("freq").desc(), F.col("word")).limit(max_words)
    return w


def _pair_counts(vocab: Dict[Tuple[str, ...], int]) -> Dict[Tuple[str, str], int]:
    counts: Dict[Tuple[str, str], int] = {}
    for sym, freq in vocab.items():
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            counts[p] = counts.get(p, 0) + freq
    return counts


def _merge_word(sym: Tuple[str, ...], pair: Tuple[str, str]) -> Tuple[str, ...]:
    a, b = pair
    out: List[str] = []
    i = 0
    while i < len(sym):
        if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe(
    word_freq: Iterable[Tuple[str, int]],
    num_merges: int = 1000,
) -> List[Tuple[str, str]]:
    """Classic BPE merge training over a (word, freq) table (the output of
    ``word_frequencies().collect()`` or any iterable). Ties on pair count
    break lexicographically — fully deterministic. Returns merges in rank
    order."""
    vocab: Dict[Tuple[str, ...], int] = {}
    for word, freq in word_freq:
        sym = tuple(word) + (_END,)
        vocab[sym] = vocab.get(sym, 0) + int(freq)
    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        # deterministic argmax: highest count, then lexicographically
        # smallest pair
        best_pair, best_n = None, -1
        for p, n in counts.items():
            if n > best_n or (n == best_n and p < best_pair):
                best_pair, best_n = p, n
        if best_n < 2:  # nothing repeats — further merges are noise
            break
        merges.append(best_pair)
        vocab = {_merge_word(s, best_pair): f for s, f in vocab.items()}
    return merges


def bpe_encode_word(word: str, ranks: Dict[Tuple[str, str], int]) -> List[str]:
    """Tokenize one word with trained merge ranks (lowest rank first —
    the standard BPE apply loop)."""
    sym: List[str] = list(word) + [_END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        merged = _merge_word(tuple(sym), (sym[best_i], sym[best_i + 1]))
        sym = list(merged)
    return sym


def merges_to_df(spark: SparkSession, merges: Sequence[Tuple[str, str]]) -> DataFrame:
    """Persistable tokenizer state: (rank, left, right)."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, left string, right string",
    )


def merges_from_df(df: DataFrame) -> List[Tuple[str, str]]:
    return [(r.left, r.right)
            for r in df.orderBy("rank").collect()]


def apply_bpe(
    df: DataFrame,
    text_col: str,
    merges: Sequence[Tuple[str, str]],
    out_col: str = "tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with trained merges: ranks broadcast once,
    Arrow-batched scalar pandas UDF, per-batch word→tokens memo (Zipf hit
    rates make the amortized cost ~O(chars)). Adds ``out_col``
    array<string>."""
    sc = df.sparkSession.sparkContext
    b_ranks = sc.broadcast({tuple(p): i for i, p in enumerate(merges)})

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tok(texts: pd.Series) -> pd.Series:
        ranks = b_ranks.value
        memo: Dict[str, List[str]] = {}
        out = []
        for t in texts:
            toks: List[str] = []
            for w in (t or "").lower().split():
                got = memo.get(w)
                if got is None:
                    got = bpe_encode_word(w, ranks)
                    memo[w] = got
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, _tok(F.col(text_col)))


def bpe_token_count(
    df: DataFrame,
    text_col: str,
    merges: Sequence[Tuple[str, str]],
    out_col: str = "n_tokens",
) -> DataFrame:
    """Token counts without materializing token arrays (the budget pass a
    packing/mixing stage needs)."""
    tok = apply_bpe(df, text_col, merges, out_col="__toks")
    return tok.withColumn(out_col, F.size("__toks")).drop("__toks")
