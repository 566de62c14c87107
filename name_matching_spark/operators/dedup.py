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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def normalized_words(col):
    """lower + whitespace-split word array (empty strings removed)."""
    return F.split(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")), " ")


def doc_shingle_arrays(df: DataFrame, id_col: str, text_col: str,
                       k: int = 3) -> DataFrame:
    """-> (id, sh): each document's DISTINCT word k-shingles as one array
    column, built entirely inside whole-stage codegen -- no explode, no
    distinct shuffle.  The array is the primary representation for the
    dedup path: signatures, band hashes and set sizes all derive from it
    per row, and the long form is just ``explode(sh)``."""
    w = df.select(F.col(id_col).alias("id"),
                  normalized_words(F.col(text_col)).alias("w"))
    return (
        w.filter(F.size("w") >= k)
        .select(
            "id",
            F.array_distinct(
                F.expr(f"transform(sequence(1, size(w) - {k} + 1), "
                       f"i -> concat_ws(' ', slice(w, i, {k})))")
            ).alias("sh"),
        )
    )


def word_shingles(df: DataFrame, id_col: str, text_col: str,
                  k: int = 3) -> DataFrame:
    """-> (id, shingle): distinct word k-shingles, built JVM-side."""
    return doc_shingle_arrays(df, id_col, text_col, k).select(
        "id", F.explode("sh").alias("shingle"))


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


def minhash_signatures(shingles: DataFrame, num_hashes: int = 16,
                       hash_mode: str = "xxhash64") -> DataFrame:
    """-> (id, seed, minhash): per-document MinHash signature, long form.

    Two hash families:

    * ``xxhash64`` (default, production): h_seed(s) = xxhash64(seed, s) --
      a JVM-side 64-bit int hash, no string materialization; minhash is a
      plain long.  ~an order of magnitude fewer bytes shuffled and hashed
      than the hex mode; this is what you run at 100 TB.
    * ``md5`` (oracle mode): h_seed(s) = md5('<seed>|' || s) hex string,
      bit-identical to the DuckDB correctness oracle; minimizing the hex
      string lexicographically is order-isomorphic to minimizing the
      128-bit integer.

    Long form keeps signatures joinable and avoids array-ordering pitfalls.
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    base = shingles.select("id", "shingle", seeds)
    if hash_mode == "xxhash64":
        h = F.xxhash64(F.col("seed"), F.col("shingle"))
    elif hash_mode == "md5":
        h = F.md5(F.concat_ws("|", F.col("seed").cast("string"),
                              F.col("shingle")))
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    return (base.withColumn("h", h)
            .groupBy("id", "seed")
            .agg(F.min("h").alias("minhash")))


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 4,
                        bucket_cap: int | None = None) -> DataFrame:
    """-> (id_a, id_b): pairs agreeing on at least one LSH band.

    rows_per_band = num_hashes / bands; band key = hash of the sorted
    (seed, minhash) rows inside the band -- xxhash64 of the struct array
    for long signatures (pure JVM), md5 of the concatenated strings for
    hex signatures (DuckDB-reproducible).

    ``bucket_cap`` bounds the within-bucket pair expansion, THE scale
    hazard of any band join: b near-identical documents (a web corpus's
    boilerplate family) share one bucket and the default all-pairs join
    emits O(b^2) rows -- 10^12 pairs from a single 10^6-doc family.
    Buckets above the cap instead emit per-bucket REPRESENTATIVE edges
    (min_id_in_bucket, id): linear output that keeps every bucket member
    transitively connected, so downstream connected-components dedup
    (O32) produces the same keeper groups whenever the verify stage
    accepts the representative edges (trivially true for the
    near-identical families that create oversized buckets in the first
    place).  Default None preserves the exact all-pairs semantics the
    value oracles pin."""
    sig = signatures.withColumn("band", F.col("seed") % bands)
    if dict(signatures.dtypes)["minhash"] == "bigint":
        bh = F.xxhash64(F.sort_array(
            F.collect_list(F.struct("seed", "minhash"))))
    else:
        bh = F.md5(F.concat_ws(",", F.sort_array(
            F.collect_list(F.concat_ws(":", F.col("seed").cast("string"),
                                       F.col("minhash"))))))
    band_hash = sig.groupBy("id", "band").agg(bh.alias("bh"))
    return _band_pairs(band_hash, bucket_cap)


def _minhash_cols(num_hashes: int, hash_mode: str,
                  sh_col: str = "sh") -> list:
    """Per-seed minhash expressions over a distinct-shingle ARRAY column:
    value-identical to minhash_signatures' explode+groupBy-min (same hash
    functions, array_min == min aggregate; lexicographic string min for
    the md5 family is order-isomorphic to the 128-bit integer min), but
    computed inside codegen per row -- the num_hashes x |shingles| rows
    never exist, let alone shuffle."""
    # NB: the per-seed hash lambda MUST take exactly one parameter --
    # pyspark infers transform's lambda arity from the signature, so a
    # two-arg lambda (even with a default) becomes an (element, index)
    # lambda and the second name silently binds the index column
    def _h(seed: int):
        if hash_mode == "xxhash64":
            return lambda s: F.xxhash64(F.lit(seed), s)
        if hash_mode == "md5":
            return lambda s: F.md5(F.concat_ws("|", F.lit(str(seed)), s))
        raise ValueError(f"unknown hash_mode {hash_mode!r}")

    return [
        F.array_min(F.transform(sh_col, _h(seed))).alias(f"__mh{seed}")
        for seed in range(num_hashes)
    ]


def _band_table(arrays: DataFrame, num_hashes: int, bands: int,
                hash_mode: str) -> DataFrame:
    """(id, sh array) -> (id, band, bh): per-document band hashes, fused.

    Reproduces lsh_candidate_pairs' band keys bit-exactly -- xxhash64 of
    the seed-ascending (seed, minhash) struct array for the int family
    (sort_array over struct(seed, ...) sorts by seed first, which is the
    construction order here), md5 of the comma-joined LEXICOGRAPHICALLY
    sorted "seed:hash" strings for the hex family -- without the
    (id, seed) aggregation or the (id, band) aggregation shuffles."""
    sig = arrays.select("id", *_minhash_cols(num_hashes, hash_mode))
    band_structs = []
    for band in range(bands):
        seeds = [s for s in range(num_hashes) if s % bands == band]
        if hash_mode == "xxhash64":
            bh = F.xxhash64(F.array(*[
                F.struct(F.lit(s).cast("int").alias("seed"),
                         F.col(f"__mh{s}").alias("minhash"))
                for s in seeds]))
        else:
            bh = F.md5(F.concat_ws(",", F.sort_array(F.array(*[
                F.concat_ws(":", F.lit(str(s)), F.col(f"__mh{s}"))
                for s in seeds]))))
        band_structs.append(F.struct(F.lit(band).alias("band"),
                                     bh.alias("bh")))
    return sig.select(
        "id", F.explode(F.array(*band_structs)).alias("b")
    ).select("id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))


def _band_pairs(band_hash: DataFrame,
                bucket_cap: int | None) -> DataFrame:
    """(id, band, bh) -> distinct (id_a, id_b) candidate pairs, with the
    optional representative-edge cap for oversized buckets (see
    lsh_candidate_pairs)."""
    if bucket_cap is None:
        a = band_hash.select(F.col("id").alias("id_a"), "band", "bh")
        b = band_hash.select(F.col("id").alias("id_b"), "band", "bh")
        return (
            a.join(b, ["band", "bh"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
    w = Window.partitionBy("band", "bh")
    marked = (band_hash
              .withColumn("__n", F.count(F.lit(1)).over(w))
              .withColumn("__rep", F.min("id").over(w)))
    small = marked.filter(F.col("__n") <= bucket_cap)
    sa = small.select(F.col("id").alias("id_a"), "band", "bh")
    sb = small.select(F.col("id").alias("id_b"), "band", "bh")
    pairs_small = (sa.join(sb, ["band", "bh"])
                   .filter(F.col("id_a") < F.col("id_b"))
                   .select("id_a", "id_b"))
    stars = (marked.filter((F.col("__n") > bucket_cap)
                           & (F.col("id") != F.col("__rep")))
             .select(F.col("__rep").alias("id_a"),
                     F.col("id").alias("id_b")))
    return pairs_small.unionByName(stars).distinct()


def shingle_jaccard(shingles: DataFrame, pairs: DataFrame | None = None,
                    min_jaccard: float = 0.0,
                    sizes: DataFrame | None = None) -> DataFrame:
    """-> (id_a, id_b, jaccard) over distinct-shingle sets.

    With ``pairs`` given, only verifies those candidates (the LSH path);
    otherwise scores every pair sharing >= 1 shingle (exact quadratic path,
    small inputs only -- the scale path is LSH + verify).  ``sizes``
    accepts a precomputed (id, n) set-size table (free as ``size(sh)``
    when the caller holds shingle arrays) so no counting aggregation over
    the exploded shingles is needed.
    """
    if sizes is None:
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
                      min_jaccard: float = 0.5,
                      hash_mode: str = "xxhash64",
                      bucket_cap: int | None = None) -> DataFrame:
    """Full near-dup path: shingle -> minhash -> band join -> verify.

    The shingle table feeds both the signature and the verify stage, so it
    is persisted for the lifetime of the returned plan (one computation
    instead of three).  hash_mode="md5" is the DuckDB-reproducible oracle
    family; the default int family is the production path (see
    minhash_signatures).  ``bucket_cap`` caps the within-bucket pair
    expansion via representative edges (see lsh_candidate_pairs) -- set
    it on boilerplate-heavy corpora where identical-signature families
    would otherwise emit quadratic candidate counts.

    Plan shape (round 6): documents are carried as distinct-shingle
    ARRAYS; signatures and band hashes derive from the array per row
    (``_minhash_cols``/``_band_table``), so the only shuffles left are
    the band equi-join and the candidate verification -- the former
    num_hashes x |shingles| signature aggregation and the (id, band)
    band-hash aggregation are now codegen projections.  Set sizes come
    free as size(sh).  Values are identical to the long-form operators
    (same hash family, same band keys -- locked by the
    minhash_signatures / lsh_jaccard_pairs oracles and
    tests/test_dedup_modes.py)."""
    arrays = doc_shingle_arrays(df, id_col, text_col).persist()
    band_hash = _band_table(arrays, num_hashes, bands, hash_mode)
    cand = _band_pairs(band_hash, bucket_cap)
    sh = arrays.select("id", F.explode("sh").alias("shingle"))
    sizes = arrays.select("id", F.size("sh").alias("n"))
    return shingle_jaccard(sh, pairs=cand, min_jaccard=min_jaccard,
                           sizes=sizes)


def _simhash64(tokens: list[str]) -> int:
    """Reference scalar SimHash (test oracle for the vectorized kernel)."""
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


# bit weights in np.unpackbits order: column c of the unpacked (tokens, 64)
# bit matrix is bit (63 - c) of the big-endian 8-byte hash prefix
_SIMHASH_WEIGHTS = (1 << np.arange(63, -1, -1).astype(np.uint64))


def _simhash64_batch(texts: list[str]) -> np.ndarray:
    """Vector of _simhash64 values: md5 per DISTINCT token (cached across
    the batch -- web-text vocabulary repeats heavily), then one numpy
    unpackbits + sum for the 64-way bit vote instead of a 64-iteration
    Python inner loop per token."""
    digest_cache: dict[str, bytes] = {}
    out = np.empty(len(texts), np.int64)
    for i, text in enumerate(texts):
        tokens = str(text).lower().split()
        if not tokens:
            out[i] = 0
            continue
        bufs = []
        for t in tokens:
            d = digest_cache.get(t)
            if d is None:
                d = hashlib.md5(t.encode()).digest()[:8]
                digest_cache[t] = d
            bufs.append(d)
        mat = np.frombuffer(b"".join(bufs), dtype=np.uint8).reshape(-1, 8)
        bits = np.unpackbits(mat, axis=1)          # (tokens, 64) MSB-first
        pos = bits.sum(axis=0, dtype=np.int64)     # votes = 2*pos - n
        mask = pos * 2 > len(tokens)               # votes > 0
        val = (_SIMHASH_WEIGHTS[mask]).sum(dtype=np.uint64)
        out[i] = int(val) - (1 << 64) if int(val) >= (1 << 63) else int(val)
    return out


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """-> (id, simhash): 64-bit SimHash over lowercase word tokens
    (Arrow-batched pandas UDF -- the bit-vote loop has no JVM expression;
    kernel = _simhash64_batch, value-identical to _simhash64)."""

    @F.pandas_udf(LongType())
    def _sh(texts: pd.Series) -> pd.Series:
        return pd.Series(_simhash64_batch(list(texts)))

    return df.select(F.col(id_col).alias("id"),
                     _sh(F.col(text_col)).alias("simhash"))


def simhash_near_dups(df: DataFrame, id_col: str, text_col: str,
                      max_hamming: int = 3,
                      bucket_cap: int | None = None) -> DataFrame:
    """-> (id_a, id_b, hamming): pairs within hamming distance, found by
    exact match on 4 x 16-bit chunks (any chunk equal -> candidate), the
    standard scale-out for simhash.

    ``bucket_cap``: chunk buckets above the cap emit representative edges
    (min_id, id) instead of all pairs -- linear output for the
    identical-simhash families that make chunk buckets explode, CC-
    equivalent connectivity (hamming 0 within such a family passes any
    threshold); see lsh_candidate_pairs.  Default None = exact all-pairs
    semantics (the simhash_pairs oracle)."""
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
    if bucket_cap is None:
        a = chunks.select(F.col("id").alias("id_a"),
                          F.col("simhash").alias("sh_a"), "chunk", "v")
        b = chunks.select(F.col("id").alias("id_b"),
                          F.col("simhash").alias("sh_b"), "chunk", "v")
        cand = (a.join(b, ["chunk", "v"])
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b", "sh_a", "sh_b").distinct())
    else:
        w = Window.partitionBy("chunk", "v")
        marked = (chunks
                  .withColumn("__n", F.count(F.lit(1)).over(w))
                  .withColumn("__rep", F.min(F.struct("id", "simhash"))
                              .over(w)))
        small = marked.filter(F.col("__n") <= bucket_cap)
        sa = small.select(F.col("id").alias("id_a"),
                          F.col("simhash").alias("sh_a"), "chunk", "v")
        sb = small.select(F.col("id").alias("id_b"),
                          F.col("simhash").alias("sh_b"), "chunk", "v")
        pairs_small = (sa.join(sb, ["chunk", "v"])
                       .filter(F.col("id_a") < F.col("id_b"))
                       .select("id_a", "id_b", "sh_a", "sh_b"))
        stars = (marked.filter((F.col("__n") > bucket_cap)
                               & (F.col("id") != F.col("__rep.id")))
                 .select(F.col("__rep.id").alias("id_a"),
                         F.col("id").alias("id_b"),
                         F.col("__rep.simhash").alias("sh_a"),
                         F.col("simhash").alias("sh_b")))
        cand = pairs_small.unionByName(stars).distinct()
    return (
        cand.withColumn("hamming",
                        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
