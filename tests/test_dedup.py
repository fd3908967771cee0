"""MinHash-LSH and SimHash near-dup: sanity + recall against the exact
n-gram Jaccard computation."""

from __future__ import annotations

import pyspark.sql.functions as F

from detector_network_processor_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_near_dups,
)
from detector_network_processor_spark.plans import all_queries

from conftest import SF_DIR


def _doc(doc_id, text):
    return dict(doc_id=doc_id, text=text)


def test_minhash_identical_docs_collide(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            _doc(1, base),
            _doc(2, base),  # exact dup
            # near dup: one appended word -> jaccard 11/12, band-collision
            # miss probability ~3e-9 (a mid-string replacement at this doc
            # length gives jaccard ~0.57 where LSH legitimately misses ~17%
            # of hash families — too flaky for a unit test)
            _doc(3, base + " tonight"),
            _doc(4, "completely different words about spark query engines and shuffles here"),
        ]
    )
    sigs = minhash_signatures(docs)
    pairs = {(r.doc_a, r.doc_b): r.est_jaccard for r in minhash_lsh_pairs(sigs).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.3
    assert all(4 not in p for p in pairs)


def test_simhash_duplicate_hamming_zero(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [_doc(1, base), _doc(2, base), _doc(3, "unrelated totally different content words entirely")]
    )
    got = {(r.doc_a, r.doc_b): r.hamming for r in simhash_near_dups(docs).collect()}
    assert got.get((1, 2)) == 0


def test_minhash_lsh_recall_vs_exact(spark):
    """Every high-jaccard pair found by the exact shingle computation must
    be recovered by the LSH path (j >= 0.5 -> collision prob ~1-(1-0.5^4)^16
    ~ 0.65 per band set... asserted empirically on the fixture corpus)."""
    exact = all_queries()["near_dup_jaccard"].fn(spark, SF_DIR)
    strong = {
        (r.doc_a, r.doc_b)
        for r in exact.filter(F.col("jaccard") >= 0.5).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(minhash_signatures(docs)).collect()
    }
    if strong:
        recall = len(strong & got) / len(strong)
        assert recall >= 0.9, f"LSH recall {recall} over {len(strong)} strong pairs"
