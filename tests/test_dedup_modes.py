"""MinHash hash-mode equivalence + vectorized SimHash parity."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from name_matching_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog every day",
        "the quick brown fox jumps over the lazy cat every day",
        "the quick brown fox jumps over the lazy dog every day",
        "completely unrelated text about training data pipelines",
        "training data pipelines need deduplication at scale now",
        "training data pipelines need deduplication at web scale",
    ]
    rng = random.Random(9)
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu").split()
    extra = [" ".join(rng.choices(words, k=12)) for _ in range(40)]
    rows = [(i, t) for i, t in enumerate(base + extra)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hash_modes_same_verified_pairs(docs):
    """The verified (jaccard-filtered) near-dup set must be identical under
    the md5 oracle family and the xxhash64 production family -- candidates
    may differ at the margin, but verification is exact."""
    md5_pairs = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in dedup.minhash_lsh_dedup(
            docs, "doc_id", "text", num_hashes=16, bands=8,
            min_jaccard=0.4, hash_mode="md5").collect()
    }
    int_pairs = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in dedup.minhash_lsh_dedup(
            docs, "doc_id", "text", num_hashes=16, bands=8,
            min_jaccard=0.4, hash_mode="xxhash64").collect()
    }
    assert md5_pairs == int_pairs
    assert (0, 2, 1.0) in int_pairs


def test_int_signatures_are_longs(spark, docs):
    sh = dedup.word_shingles(docs, "doc_id", "text")
    sig = dedup.minhash_signatures(sh, num_hashes=4)
    assert dict(sig.dtypes)["minhash"] == "bigint"
    sig_md5 = dedup.minhash_signatures(sh, num_hashes=4, hash_mode="md5")
    assert dict(sig_md5.dtypes)["minhash"] == "string"


def test_unknown_hash_mode_raises(docs):
    sh = dedup.word_shingles(docs, "doc_id", "text")
    with pytest.raises(ValueError):
        dedup.minhash_signatures(sh, hash_mode="sha1")


def test_simhash_batch_matches_scalar():
    rng = random.Random(5)
    words = ["the", "quick", "brown", "fox", "data", "über", "x1", "-"]
    texts = [" ".join(rng.choices(words, k=rng.randint(0, 40)))
             for _ in range(400)] + ["", "   ", "single"]
    got = dedup._simhash64_batch(texts)
    exp = np.array([dedup._simhash64(t.lower().split()) for t in texts])
    assert (got == exp).all()


def test_simhash_spark_value(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, ""), (3, "the quick brown fix")],
        "doc_id long, text string")
    rows = {r["id"]: r["simhash"]
            for r in dedup.simhash(df, "doc_id", "text").collect()}
    assert rows[1] == dedup._simhash64("the quick brown fox".split())
    assert rows[2] == 0
    # near-identical docs stay within a small hamming distance
    assert bin((rows[1] ^ rows[3]) & ((1 << 64) - 1)).count("1") <= 16


def test_bucket_cap_linear_on_identical_family(spark):
    """Round-5 verdict item #2: a big identical-text family (one LSH
    bucket per band) must yield LINEAR candidate counts under bucket_cap
    -- representative star edges, one component under CC -- instead of
    the O(n^2) all-pairs expansion."""
    n = 10_000
    fam = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate template text repeated verbatim "
              "across the whole crawl again and again").alias("text"))
    pairs = dedup.minhash_lsh_dedup(fam, "doc_id", "text", num_hashes=8,
                                    bands=2, min_jaccard=0.5,
                                    bucket_cap=50)
    rows = pairs.collect()
    # star edges: every doc linked to the family minimum, exactly once
    assert len(rows) == n - 1
    assert {r["id_a"] for r in rows} == {0}
    assert all(abs(r["jaccard"] - 1.0) < 1e-12 for r in rows)
    # simhash twin: same family, same linear shape
    sp = dedup.simhash_near_dups(fam, "doc_id", "text", max_hamming=3,
                                 bucket_cap=50).collect()
    assert len(sp) == n - 1
    assert {r["id_a"] for r in sp} == {0}
    assert all(r["hamming"] == 0 for r in sp)


def test_bucket_cap_default_and_small_buckets_unchanged(docs):
    """Default (None) keeps the oracle-pinned all-pairs semantics, and a
    cap larger than every bucket is a behavioral no-op."""
    base = dedup.minhash_lsh_dedup(docs, "doc_id", "text", num_hashes=16,
                                   bands=8, min_jaccard=0.4,
                                   hash_mode="md5")
    capped = dedup.minhash_lsh_dedup(docs, "doc_id", "text", num_hashes=16,
                                     bands=8, min_jaccard=0.4,
                                     hash_mode="md5", bucket_cap=1000)
    key = lambda r: (r["id_a"], r["id_b"], round(r["jaccard"], 9))
    assert sorted(map(key, base.collect())) \
        == sorted(map(key, capped.collect()))
    s_base = dedup.simhash_near_dups(docs, "doc_id", "text", max_hamming=12)
    s_cap = dedup.simhash_near_dups(docs, "doc_id", "text", max_hamming=12,
                                    bucket_cap=1000)
    k2 = lambda r: (r["id_a"], r["id_b"], r["hamming"])
    assert sorted(map(k2, s_base.collect())) \
        == sorted(map(k2, s_cap.collect()))
