"""Approximate-nearest-neighbour search over an embedding column.

Brute-force cosine top-k (correctness baseline; one broadcast join, JVM-side
zip_with dot products) and an LSH-bucketed variant (random-hyperplane signs,
the scale path: candidates only within matching sign-buckets, so the shuffle
is bucket-local instead of a full cross join).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def _as_double_array(col):
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    qid_col: str = "qid", qvec_col: str = "qvec",
    round_decimals: int | None = None,
) -> DataFrame:
    """-> (qid, vec_id, rank): exact cosine top-k per query.

    queries is expected to be small (broadcast side); ranking excludes
    nothing, ties break on vec_id ascending.  ``round_decimals`` rounds the
    cosine before ranking for summation-order-independent ordering.
    """
    v = vectors.select(F.col(id_col).alias("vec_id"),
                       _as_double_array(F.col(vec_col)).alias("v"))
    q = queries.select(F.col(qid_col).alias("qid"),
                       _as_double_array(F.col(qvec_col)).alias("qv"))
    scored = v.join(F.broadcast(q)).withColumn(
        "cosine", _cosine(F.col("qv"), F.col("v")))
    if round_decimals is not None:
        scored = scored.withColumn(
            "cosine", F.round(F.col("cosine"), round_decimals))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(),
                                          F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "rank")
    )


def _hyperplane(seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane from md5 bits."""
    out = []
    i = 0
    while len(out) < dim:
        h = hashlib.md5(f"{seed}:{i}".encode()).digest()
        for b in range(0, 16, 4):
            u = int.from_bytes(h[b:b + 4], "big") / 2 ** 32
            out.append(2.0 * u - 1.0)
            if len(out) == dim:
                break
        i += 1
    norm = math.sqrt(sum(x * x for x in out)) or 1.0
    return [x / norm for x in out]


def _sig_col(vcol, table: int, dim: int, num_planes: int):
    """Sign-signature bucket key for one LSH table: num_planes md5-derived
    hyperplane dots, each rounded to 9 decimals before the sign test so
    bucket assignment is summation-order independent across engines."""
    bits = []
    for p in range(num_planes):
        plane = _hyperplane(table * 1000 + p, dim)
        dot = F.round(
            F.aggregate(
                F.zip_with(vcol,
                           F.array(*[F.lit(x) for x in plane]),
                           lambda a, b: a * b),
                F.lit(0.0), lambda acc, x: acc + x),
            9)
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(F.lit(f"t{table}:"), *bits)


def lsh_bucket_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    qid_col: str = "qid", qvec_col: str = "qvec",
    dim: int = 64, num_planes: int = 6, num_tables: int = 4,
    round_decimals: int | None = None,
) -> DataFrame:
    """-> (qid, vec_id, rank): approximate top-k via random-hyperplane LSH.

    num_tables independent sign-signatures of num_planes bits each; a vector
    is a candidate if it lands in the same bucket as the query in ANY table.
    Recall improves with num_tables; cost scales with bucket occupancy
    (n / 2^num_planes per table) instead of n.

    The hyperplanes are md5-deterministic (``_hyperplane``), so the whole
    operator is value-oracle-able: the DuckDB twin embeds the same plane
    components as SQL literals.  Plane dots are rounded to 9 decimals
    before the sign test and ``round_decimals`` rounds the final cosine,
    making bucket assignment and ranking summation-order independent.

    Shuffle-volume shape: the bucket join and the multi-table-collision
    dedup run over (id, bucket) KEY tables only -- the dim-sized vectors
    are joined back per surviving candidate pair afterwards, so neither
    the bucket-join shuffle nor the distinct exchange carries arrays
    (~dim x smaller exchanges at embedding-corpus scale).  Ids are
    expected unique per side; duplicated id rows are deduped (arbitrary
    survivor) on the JOIN-BACK sides only, so they cannot multiply
    candidate rows -- the dedup keys the same column that join shuffles
    on (partitioning is reused: one extra HashAggregate, no extra
    Exchange), and the narrow bucket-explode path stays shuffle-free.
    """
    v = vectors.select(F.col(id_col).alias("vec_id"),
                       _as_double_array(F.col(vec_col)).alias("v"))
    q = queries.select(F.col(qid_col).alias("qid"),
                       _as_double_array(F.col(qvec_col)).alias("qv"))
    v_b = v.select(
        "vec_id",
        F.explode(F.array(*[_sig_col(F.col("v"), t, dim, num_planes)
                            for t in range(num_tables)])).alias("bucket"))
    q_b = q.select(
        "qid",
        F.explode(F.array(*[_sig_col(F.col("qv"), t, dim, num_planes)
                            for t in range(num_tables)])).alias("bucket"))
    cand_keys = (v_b.join(q_b, "bucket")
                 .select("qid", "vec_id").distinct())
    cand = (
        cand_keys.join(q.dropDuplicates(["qid"]), "qid")
        .join(v.dropDuplicates(["vec_id"]), "vec_id")
        .withColumn("cosine", _cosine(F.col("qv"), F.col("v")))
    )
    if round_decimals is not None:
        cand = cand.withColumn(
            "cosine", F.round(F.col("cosine"), round_decimals))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(),
                                          F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "rank")
    )


def ivf_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 5,
    n_cells: int = 16, n_probe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    qid_col: str = "qid", qvec_col: str = "qvec",
    centroids: DataFrame | None = None,
    round_decimals: int = 9,
) -> DataFrame:
    """-> (qid, vec_id, rank): IVF-flat approximate top-k.

    Inverted-file structure: every vector is assigned to its nearest of
    ``n_cells`` coarse centroids (one broadcast join + per-vector argmax),
    queries probe the ``n_probe`` nearest cells and scan only those
    inverted lists.  Cost per query ~ n_probe/n_cells of the corpus, and
    the candidate join is an equi-join on the cell id -- partition-local at
    scale (co-partition the inverted file by cell).

    Default centroids are the ``n_cells`` lowest-id vectors -- a
    deterministic sampled coarse quantizer, exactly reproducible in the
    DuckDB value oracle; pass ``centroids=kmeans_centroids(...)`` for
    learned cells (same plan shape, better balance).  Cosines are rounded
    before every ranking so assignment/probe/final order is summation-order
    independent.
    """
    v = vectors.select(F.col(id_col).alias("vec_id"),
                       _as_double_array(F.col(vec_col)).alias("v"))
    q = queries.select(F.col(qid_col).alias("qid"),
                       _as_double_array(F.col(qvec_col)).alias("qv"))
    if centroids is None:
        centroids = (v.orderBy("vec_id").limit(n_cells)
                     .select(F.col("vec_id").alias("cid"),
                             F.col("v").alias("cvec")))

    def nearest_cells(df, key, vcol, n):
        scored = df.join(F.broadcast(centroids)).withColumn(
            "__c", F.round(_cosine(F.col(vcol), F.col("cvec")),
                           round_decimals))
        w = Window.partitionBy(key).orderBy(F.col("__c").desc(),
                                            F.col("cid").asc())
        return (scored.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= n)
                .drop("__c", "__rn", "cvec"))

    inverted = nearest_cells(v, "vec_id", "v", 1)       # inverted file
    probes = nearest_cells(q, "qid", "qv", n_probe)     # probed cells
    cand = probes.join(inverted, "cid").withColumn(
        "cosine", F.round(_cosine(F.col("qv"), F.col("v")), round_decimals))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(),
                                          F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "rank")
    )


def kmeans_centroids(vectors: DataFrame, n_cells: int = 16,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     seed: int = 42, max_iter: int = 10) -> DataFrame:
    """Learned coarse quantizer for ivf_topk via pyspark.ml KMeans:
    -> (cid, cvec).  Same downstream plan; better cell balance than the
    sampled default on clustered corpora."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = vectors.select(
        array_to_vector(_as_double_array(F.col(vec_col))).alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feat)
    spark = vectors.sparkSession
    rows = [(i, [float(x) for x in c])
            for i, c in enumerate(model.clusterCenters())]
    return spark.createDataFrame(rows, "cid int, cvec array<double>")


def embedding_near_dups_lsh(
    vectors: DataFrame, id_col: str = "vec_id",
    vec_col: str = "embedding", min_cosine: float = 0.9,
    dim: int = 64, num_planes: int = 4, num_tables: int = 8,
    round_decimals: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """-> (id_a, id_b, cosine): embedding near-duplicates, the scale path.

    Candidate pairs are vectors sharing a sign-bucket in ANY of
    ``num_tables`` LSH tables (bucket-local self equi-join -- NOT the
    quadratic all-pairs cross of ``embedding_near_dups``); exact cosine is
    verified on candidates only.  Candidate volume per table is
    sum_b n_b^2 over bucket occupancies (~ n^2 / 2^num_planes for balanced
    buckets) and the join shuffles on the bucket key, so the plan is
    partition-local at 100 TB the same way minhash-LSH dedup is.  A pair at
    cosine c agrees with one plane w.p. 1 - acos(c)/pi, so recall at the
    default (4 planes x 8 tables, c >= 0.9) is ~0.99.

    Fully deterministic (md5 hyperplanes, 9-dp sign-test rounding), hence
    value-oracle-able via generated SQL with literal plane components.

    ``max_bucket`` is the hot-bucket skew guard for degenerate corpora
    (e.g. millions of near-identical boilerplate pages landing in one
    sign bucket, whose self-join is quadratic in the bucket): buckets
    above the cap are dropped from candidate generation -- a recall/cost
    knob, off by default so results stay exactly the uncapped semantics.
    A pair sharing any OTHER table's (un-hot) bucket still surfaces,
    which is exactly the multi-table redundancy's job.

    Ids are expected unique; duplicated id rows are deduped (arbitrary
    survivor) on the join-back sides so they cannot multiply candidate
    rows (dup (id, bucket) rows on the bucket path are already absorbed
    by the cand_keys distinct).
    """
    v = vectors.select(F.col(id_col).alias("id"),
                       _as_double_array(F.col(vec_col)).alias("v"))
    # bucket table carries KEYS only -- the self-join shuffle and the
    # multi-table-collision distinct move (id, bucket) rows, not dim-sized
    # arrays; vectors are joined back per surviving candidate pair
    v_b = v.select(
        "id",
        F.explode(F.array(*[_sig_col(F.col("v"), t, dim, num_planes)
                            for t in range(num_tables)])).alias("bucket"))
    if max_bucket is not None:
        # the HOT set is tiny by construction (few skewed buckets), so it
        # broadcasts; never broadcast the surviving-bucket list, which is
        # ~n at scale
        hot = (v_b.groupBy("bucket").count()
               .filter(F.col("count") > max_bucket).select("bucket"))
        v_b = v_b.join(F.broadcast(hot), "bucket", "left_anti")
    a = v_b.select(F.col("id").alias("id_a"), "bucket")
    b = v_b.select(F.col("id").alias("id_b"), "bucket")
    cand_keys = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct()
    )
    v_uniq = v.dropDuplicates(["id"])
    cand = (
        cand_keys
        .join(v_uniq.select(F.col("id").alias("id_a"),
                            F.col("v").alias("va")), "id_a")
        .join(v_uniq.select(F.col("id").alias("id_b"),
                            F.col("v").alias("vb")), "id_b")
        .withColumn("cosine", _cosine(F.col("va"), F.col("vb")))
    )
    if round_decimals is not None:
        cand = cand.withColumn(
            "cosine", F.round(F.col("cosine"), round_decimals))
    return (cand.filter(F.col("cosine") >= min_cosine)
            .select("id_a", "id_b", "cosine"))


def embedding_near_dups(vectors: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        min_cosine: float = 0.95) -> DataFrame:
    """-> (id_a, id_b, cosine): all-pairs cosine near-duplicates.

    Quadratic verify -- use only downstream of an LSH candidate pass at
    scale (``embedding_near_dups_lsh``); kept exact here as the dedup
    oracle baseline."""
    v = vectors.select(F.col(id_col).alias("id"),
                       _as_double_array(F.col(vec_col)).alias("v"))
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )
