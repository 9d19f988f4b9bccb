"""Pin the NULL-injection contract (round-9 verdict ask #3).

The engine guarantee on null-injected inputs (NULL text / event values /
embedding arrays) is CRASH-FREEDOM: every query runs, zero Spark or
DuckDB errors. Full value parity is a documented NON-contract —
TESTDATA.md's columns are non-null and the oracles assume it; Spark and
DuckDB propagate NULLs through regex/split/round differently, so a
frozen set of queries value-diverges BY DESIGN on null rows.

This test freezes that set exactly:

* a query CRASHING on null data fails here (regression in the
  null-robustness work from round 9);
* a query NEWLY diverging fails here (the contract grew — either fix
  the query or consciously extend the frozen list with a note);
* a query LEAVING the set also fails here (improvement — shrink the
  frozen list so the contract stays tight).

It rebuilds the null scale factor from scripts/make_degenerate_sf.py
(deterministic: limit() slices of the single-file sf0.001 parquet) and
runs the full oracle-gate replica in a subprocess (own SparkSession —
does not touch the suite's shared session). ~6 min; this is the
round-verdict's CI gate for the contract, not a unit test.
"""
from __future__ import annotations

import ast
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The frozen divergence set, measured on the round-10 tree (24 queries).
# Mechanisms, for whoever edits this list: NULL text through
# regexp/split/lower (langid, simhash, dedup keys, c4/warc/chunk/ngram
# text ops), NULL value through round/histogram bins, NULL embedding
# through PCA moments/ANN probe sets, NULL coordinates through
# hilbert/quadkey/transform.
NULL_DIVERGENT = {
    "q09_hilbert_distribution",
    "q10_quadkey",
    "q18_dedup_exact",
    "q20_simhash",
    "q23_langid",
    "q26_ngram_jaccard",
    "q35_transform",
    "q38_minhash_lsh",
    "q53_transform_utm",
    "q67_transform_epsg",
    "q69_dedup_components",
    "q70_decontaminate",
    "q77_chunk_documents",
    "q82_warc_pipeline",
    "q94_pca_project",
    "q98_corpus_diff",
    "q100_bloom_decontaminate",
    "q102_c4_filters",
    "q106_nb_quality_classifier",
    "q111_pca_power_iteration",
    "q116_ann_ivfpq",
    "q119_histogram_quantiles",
    "q135_cluster_balanced_sample",
    "q141_ngram_novelty",
}


def test_null_injection_contract(tmp_path):
    sf = str(tmp_path / "null_sf")
    build = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/make_degenerate_sf.py"),
         sf, "--nulls"],
        capture_output=True, text=True, cwd=REPO, timeout=600)
    assert build.returncode == 0, build.stderr[-2000:]

    gate = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/check_oracle.py"), sf],
        capture_output=True, text=True, cwd=REPO, timeout=1800)
    out = gate.stdout + gate.stderr

    # crash class must be EMPTY — null rows never throw in either engine
    crashes = [ln for ln in out.splitlines()
               if "spark error" in ln or "duckdb error" in ln]
    assert crashes == [], crashes

    m = re.search(r"\d+ FAILURES: (\[.*\])", out)
    diverged = set(ast.literal_eval(m.group(1))) if m else set()
    grew = diverged - NULL_DIVERGENT
    shrank = NULL_DIVERGENT - diverged
    assert not grew, (
        f"null-divergence set GREW by {sorted(grew)} — a query that used "
        f"to value-match on null rows no longer does; fix it or extend "
        f"the frozen list with a mechanism note")
    assert not shrank, (
        f"null-divergence set SHRANK by {sorted(shrank)} — improvement; "
        f"remove them from the frozen list to keep the contract tight")
