"""Document deduplication operators (training-data pipeline surface).

Exact dedup, MinHash+LSH near-dup, word-shingle Jaccard, SimHash, and
embedding-cosine near-dup -- all expressed Spark-first:

* Hashes are md5 hex strings (identical in Spark and DuckDB, so the
  correctness oracles compare bit-exact values); MinHash minimizes the hex
  string lexicographically, which is order-isomorphic to minimizing the
  128-bit integer.
* Shingling/minhashing stays JVM-side (split/transform/explode/min); only
  SimHash uses an Arrow-batched pandas UDF (bit-vote loop).
* The LSH band join is an equi-join on (band_id, band_hash) -- shuffle keys
  are uniform by construction, so no skew handling is needed beyond AQE.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def normalized_words(col):
    """lower + whitespace-split word array (empty strings removed)."""
    return F.split(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")), " ")


def word_shingles(df: DataFrame, id_col: str, text_col: str,
                  k: int = 3) -> DataFrame:
    """-> (id, shingle): distinct word k-shingles, built JVM-side."""
    w = df.select(F.col(id_col).alias("id"),
                  normalized_words(F.col(text_col)).alias("w"))
    return (
        w.filter(F.size("w") >= k)
        .select(
            "id",
            F.explode(
                F.expr(f"transform(sequence(1, size(w) - {k} + 1), "
                       f"i -> concat_ws(' ', slice(w, i, {k})))")
            ).alias("shingle"),
        )
        .distinct()
    )


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """-> (id, keeper_id, content_hash): rows whose exact text occurs more
    than once; keeper = min id per hash."""
    h = df.select(F.col(id_col).alias("id"),
                  F.md5(F.col(text_col)).alias("content_hash"))
    w = Window.partitionBy("content_hash")
    return (
        h.withColumn("keeper_id", F.min("id").over(w))
        .withColumn("dup_count", F.count(F.lit(1)).over(w))
        .filter(F.col("dup_count") > 1)
        .select("id", "keeper_id", "content_hash")
    )


def minhash_signatures(shingles: DataFrame, num_hashes: int = 16) -> DataFrame:
    """-> (id, seed, minhash): per-document MinHash signature, long form.

    h_seed(s) = md5('<seed>|' || s); the min over a document's shingles of a
    pairwise-independent-ish hash family.  Long form keeps it joinable and
    avoids array-ordering pitfalls.
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    return (
        shingles.select("id", "shingle", seeds)
        .withColumn(
            "h", F.md5(F.concat_ws("|", F.col("seed").cast("string"),
                                   F.col("shingle"))))
        .groupBy("id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 4) -> DataFrame:
    """-> (id_a, id_b): pairs agreeing on at least one LSH band.

    rows_per_band = num_hashes / bands; band hash = md5 of the concatenated
    per-seed minhashes inside the band.
    """
    sig = signatures.withColumn("band", F.col("seed") % bands)
    band_hash = (
        sig.groupBy("id", "band")
        .agg(F.md5(F.concat_ws(",", F.sort_array(
            F.collect_list(F.concat_ws(":", F.col("seed").cast("string"),
                                       F.col("minhash")))))).alias("bh"))
    )
    a = band_hash.select(F.col("id").alias("id_a"), "band", "bh")
    b = band_hash.select(F.col("id").alias("id_b"), "band", "bh")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def shingle_jaccard(shingles: DataFrame, pairs: DataFrame | None = None,
                    min_jaccard: float = 0.0) -> DataFrame:
    """-> (id_a, id_b, jaccard) over distinct-shingle sets.

    With ``pairs`` given, only verifies those candidates (the LSH path);
    otherwise scores every pair sharing >= 1 shingle (exact quadratic path,
    small inputs only -- the scale path is LSH + verify).
    """
    sizes = shingles.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = shingles.select(F.col("id").alias("id_a"), "shingle")
    b = shingles.select(F.col("id").alias("id_b"), "shingle")
    if pairs is not None:
        # scale path: expand only the candidate pairs' shingle lists --
        # never the full quadratic shingle self-join
        inter = (
            pairs.join(a, "id_a")
            .join(b, ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        inter = (
            a.join(b, "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    return (
        inter
        .join(sizes.select(F.col("id").alias("id_a"),
                           F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"),
                           F.col("n").alias("nb")), "id_b")
        .withColumn("jaccard", F.col("inter")
                    / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_dedup(df: DataFrame, id_col: str, text_col: str,
                      num_hashes: int = 16, bands: int = 4,
                      min_jaccard: float = 0.5) -> DataFrame:
    """Full near-dup path: shingle -> minhash -> band join -> verify.

    The shingle table feeds both the signature and the verify stage, so it
    is persisted for the lifetime of the returned plan (one computation
    instead of three)."""
    sh = word_shingles(df, id_col, text_col).persist()
    sig = minhash_signatures(sh, num_hashes)
    cand = lsh_candidate_pairs(sig, bands)
    return shingle_jaccard(sh, pairs=cand, min_jaccard=min_jaccard)


def _simhash64(tokens: list[str]) -> int:
    votes = [0] * 64
    for t in tokens:
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        for bit in range(64):
            votes[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if votes[bit] > 0:
            out |= 1 << bit
    # map into signed int64 for Spark LongType
    return out - (1 << 64) if out >= (1 << 63) else out


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """-> (id, simhash): 64-bit SimHash over lowercase word tokens
    (Arrow-batched pandas UDF -- the bit-vote loop has no JVM expression)."""

    @F.pandas_udf(LongType())
    def _sh(texts: pd.Series) -> pd.Series:
        return texts.astype("object").map(
            lambda t: _simhash64(str(t).lower().split()))

    return df.select(F.col(id_col).alias("id"),
                     _sh(F.col(text_col)).alias("simhash"))


def simhash_near_dups(df: DataFrame, id_col: str, text_col: str,
                      max_hamming: int = 3) -> DataFrame:
    """-> (id_a, id_b, hamming): pairs within hamming distance, found by
    exact match on 4 x 16-bit chunks (any chunk equal -> candidate), the
    standard scale-out for simhash."""
    sh = simhash(df, id_col, text_col)
    chunks = sh.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("chunk"),
                     F.shiftrightunsigned("simhash", 16 * i)
                     .bitwiseAND(F.lit(0xFFFF)).alias("v"))
            for i in range(4)
        ])).alias("c"),
    ).select("id", "simhash", F.col("c.chunk").alias("chunk"),
             F.col("c.v").alias("v"))
    a = chunks.select(F.col("id").alias("id_a"),
                      F.col("simhash").alias("sh_a"), "chunk", "v")
    b = chunks.select(F.col("id").alias("id_b"),
                      F.col("simhash").alias("sh_b"), "chunk", "v")
    cand = (a.join(b, ["chunk", "v"]).filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "sh_a", "sh_b").distinct())
    return (
        cand.withColumn("hamming",
                        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
