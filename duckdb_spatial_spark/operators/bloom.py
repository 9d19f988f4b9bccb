"""Distributed Bloom filter over a string column — the prefilter that
makes test-set decontamination (and any semi-join against a large key set)
shuffle-light at 100 TB: instead of equi-joining every corpus n-gram
against the benchmark set, each executor drops the ~(1-fpp) of grams that
cannot match before anything shuffles.

Build is genuinely distributed: each partition hashes its values into a
local bit array (double hashing, k positions), partials OR together via
``treeAggregate`` (depth 2 — no driver hot-spot collecting P partials at
once), and the final m/8-byte array broadcasts. Membership tests are
vectorized (``pd.util.hash_array`` with two fixed seeds — deterministic
across workers and sessions).

Guarantees: no false negatives ever; false-positive rate ≈ fpp at the
sized capacity. False positives only cost a little extra work downstream
(the exact join still runs), never correctness.
"""
from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["BloomFilter", "build_bloom", "bloom_might_contain",
           "bloom_size", "build_bloom_bits_local", "bloom_expr",
           "LITERAL_BLOOM_MAX_BITS"]


def _positions(values, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing of two 64-bit hashes."""
    arr = np.asarray(values, dtype=object)
    h1 = pd.util.hash_array(arr, hash_key="0123456789abcdef").astype(
        np.uint64)
    h2 = pd.util.hash_array(arr, hash_key="fedcba9876543210").astype(
        np.uint64)
    h2 = h2 | np.uint64(1)  # odd → cycles through all m for power-of-2 m
    ks = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + ks[None, :] * h2[:, None])
            % np.uint64(m_bits)).astype(np.int64)


class BloomFilter:
    def __init__(self, bits: np.ndarray, m_bits: int, k: int):
        self.bits = bits  # uint8 array of m_bits/8 bytes
        self.m_bits = m_bits
        self.k = k

    def might_contain_many(self, values) -> np.ndarray:
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        pos = _positions(values, self.m_bits, self.k)
        byte_idx, bit_idx = pos >> 3, (pos & 7).astype(np.uint8)
        hits = (self.bits[byte_idx] >> bit_idx) & 1
        return hits.all(axis=1)


def build_bloom(
    df: DataFrame,
    col: str,
    expected_items: int,
    fpp: float = 0.01,
) -> BloomFilter:
    """Size for (expected_items, fpp), build distributed, OR via
    treeAggregate."""
    m_bits = max(64, int(-expected_items * math.log(fpp)
                         / (math.log(2) ** 2)))
    m_bits = (m_bits + 7) & ~7
    k = max(1, round(m_bits / max(expected_items, 1) * math.log(2)))
    nbytes = m_bits // 8

    def partition_bits(batches) -> Iterator[pd.DataFrame]:
        acc = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            vals = pdf.iloc[:, 0].to_numpy(dtype=object)
            if len(vals):
                seen = True
                pos = _positions(vals, m_bits, k).ravel()
                np.bitwise_or.at(acc, pos >> 3,
                                 np.uint8(1) << (pos & 7).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"bits": [acc.tobytes()]})

    if nbytes * 256 <= 1 << 31:
        # Arrow path: one bit-array partial per task, OR'd driver-side —
        # the DataFrame→RDD serializer detour costs ~20 s cold (measured),
        # mapInPandas reuses the warm Arrow worker pool
        rows = df.select(col).mapInPandas(
            partition_bits, schema="bits binary").collect()
        bits = np.zeros(nbytes, dtype=np.uint8)
        for r in rows:
            bits |= np.frombuffer(r.bits, dtype=np.uint8)
    else:
        # giant filters (≥ ~1 GiB × many partitions): tree-OR so the
        # driver never holds every partial at once
        def rdd_partition_bits(it) -> Iterator[np.ndarray]:
            acc = np.zeros(nbytes, dtype=np.uint8)
            vals = [r[0] for r in it]
            if vals:
                for i in range(0, len(vals), 65536):
                    pos = _positions(vals[i:i + 65536], m_bits, k).ravel()
                    np.bitwise_or.at(
                        acc, pos >> 3,
                        np.uint8(1) << (pos & 7).astype(np.uint8))
            yield acc

        bits = (
            df.select(col).rdd.mapPartitions(rdd_partition_bits)
            .treeReduce(np.bitwise_or, depth=2)
        )
    return BloomFilter(bits, m_bits, k)


def bloom_size(expected_items: int, fpp: float) -> tuple:
    """(m_bits, k) for the target capacity/fpp — shared by every build
    path so filters built anywhere agree on geometry."""
    m_bits = max(64, int(-expected_items * math.log(fpp)
                         / (math.log(2) ** 2)))
    m_bits = (m_bits + 63) & ~63
    # cap k at 4: the optimal k for small fpp (7+ at 1%) buys little —
    # at the same m, k=4 gives ~2% fpp instead of 1% — and every probe
    # is per-row work on the scan side; false positives are corrected
    # downstream by construction everywhere this filter is used
    k = min(4, max(1, round(m_bits / max(expected_items, 1)
                            * math.log(2))))
    return m_bits, k


# Literal-expression blooms cap at 64 Ki bits (1024 array<long> words,
# ~6.8k items at fpp 0.01): beyond that the plan literal itself becomes
# the cost and the distributed build_bloom + Arrow-UDF path takes over.
LITERAL_BLOOM_MAX_BITS = 1 << 16


def build_bloom_bits_local(hash_pairs, m_bits: int, k: int) -> list:
    """Bit array (as little-endian int64 words) from pre-computed 64-bit
    hash pairs — the build half of :func:`bloom_expr`. ``hash_pairs``
    are SIGNED (h1, h2) longs, e.g. collected ``xxhash64`` columns, so
    the position math (floor-mod, then k small additions) is identical
    to the Spark-side ``pmod`` expression."""
    words = [0] * (m_bits // 64)
    for h1, h2 in hash_pairs:
        a, b = h1 % m_bits, h2 % m_bits
        for j in range(k):
            p = (a + j * b) % m_bits
            words[p >> 6] |= 1 << (p & 63)
    # to signed int64 so the values round-trip as Spark LongType literals
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_expr(words: list, m_bits: int, k: int,
               h1: Column, h2: Column) -> Column:
    """Pure-codegen Bloom membership test — no Python worker, no
    broadcast: the bit array rides the plan as an array<long> literal
    and each of the k probes is an element_at + shift + mask. Built for
    bounded key sets (≤ :data:`LITERAL_BLOOM_MAX_BITS`); the double-
    hash positions avoid bigint overflow under ANSI by reducing h1/h2
    mod m FIRST (floor-mod keeps both engines' arithmetic identical —
    Python ``%`` on signed ints IS Spark's ``pmod``)."""
    arr = F.array(*[F.lit(int(w)).cast("long") for w in words])
    a = F.pmod(h1, F.lit(m_bits)).cast("long")
    b = F.pmod(h2, F.lit(m_bits)).cast("long")
    cond = None
    for j in range(k):
        p = F.pmod(a + F.lit(j) * b, F.lit(m_bits))
        word = F.element_at(arr, F.shiftright(p, 6).cast("int") + F.lit(1))
        # getbit takes a COLUMN position (shiftright's DataFrame form
        # only accepts a Python-int literal)
        t = F.getbit(word, p.bitwiseAND(F.lit(63))) == F.lit(1)
        cond = t if cond is None else (cond & t)
    return cond


def bloom_might_contain(df: DataFrame, col: str, bloom: BloomFilter,
                        out_col: str = "might") -> DataFrame:
    """Vectorized membership column (Arrow-batched; the bloom broadcast
    once per executor)."""
    sc = df.sparkSession.sparkContext
    b = sc.broadcast((bloom.bits, bloom.m_bits, bloom.k))

    @F.pandas_udf("boolean")
    def _mc(s: pd.Series) -> pd.Series:
        bits, m, kk = b.value
        bf = BloomFilter(bits, m, kk)
        return pd.Series(bf.might_contain_many(s.to_numpy(dtype=object)))

    return df.withColumn(out_col, _mc(F.col(col)))
