"""Driver contract for the spark-graft builder (PySpark target).

One ``queries()`` entry per implemented operator from SURVEY.md §2 plus the
training-data operators; ``oracle_sql()`` gives the DuckDB-equivalent SQL
for every SQL-expressible operator (value-compared at sf=0.01).  Floating
point outputs are rounded identically on both sides, and rankings order by
rounded values with deterministic id tie-breaks, so the comparison is
summation-order independent.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# ---------------------------------------------------------------------------
# shared builders
# ---------------------------------------------------------------------------

def _docs_aug(spark, sf_dir):
    """documents + near/exact-duplicate synthetic twins (deterministic)."""
    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    exact_twin = d.select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    near_twin = d.select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.expr("substring(text, 1, length(text) - 8)").alias("text"))
    return d.unionByName(exact_twin).unionByName(near_twin)


_DOCS_AUG_SQL = """
    SELECT doc_id, text FROM documents
    UNION ALL SELECT doc_id + 10000, text FROM documents
    UNION ALL SELECT doc_id + 20000, substring(text, 1, length(text) - 8)
    FROM documents
"""

def _emb_aug(spark, sf_dir):
    """embeddings (cast to double) + near-duplicate twins: the first 60
    vectors re-appear with id+10000 and coordinate 0 shifted by +0.25 (an
    exact binary fraction, so double arithmetic is bit-identical across
    engines).  Shifted twins sit at cosine ~0.99 -- above the near-dup
    threshold but not a degenerate exact copy."""
    e = _read(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    twin = e.filter(F.col("vec_id") < 60).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.concat(F.array(F.col("v")[0] + F.lit(0.25)),
                 F.slice("v", 2, 63)).alias("v"))
    return e.unionByName(twin)


_EMB_AUG_SQL = """
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
    UNION ALL
    SELECT vec_id + 10000,
           list_concat([v[1] + 0.25], v[2:])
    FROM (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings)
    WHERE vec_id < 60
"""

_PART_GRAMS_SQL = """
    SELECT p_partkey AS id, substring(p_name, t.i, 2) AS ngram
    FROM part, LATERAL (SELECT unnest(generate_series(1, length(p_name) - 1))
                        AS i) t
    UNION ALL
    SELECT p_partkey AS id, substring(p_name, t.i, 3) AS ngram
    FROM part, LATERAL (SELECT unnest(generate_series(1, length(p_name) - 2))
                        AS i) t
    WHERE length(p_name) >= 3
"""

_QUERY_NAMES_SQL = """
    SELECT p_partkey AS id, substring(p_name, 1, length(p_name) - 2) AS name
    FROM part WHERE p_partkey % 17 = 0 AND length(p_name) > 6
"""


def _part_names(spark, sf_dir):
    return _read(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"), F.col("p_name").alias("name"))


def _query_names(spark, sf_dir):
    return _read(spark, sf_dir, "part").filter(
        (F.col("p_partkey") % 17 == 0) & (F.length("p_name") > 6)
    ).select(
        F.col("p_partkey").alias("id"),
        F.expr("substring(p_name, 1, length(p_name) - 2)").alias("name"))


def _tfidf_parts(spark, sf_dir):
    from name_matching_spark.operators.tfidf import (
        doc_count_table, explode_char_ngrams, idf_table, master_weights,
        query_weights, with_group)

    m = with_group(_part_names(spark, sf_dir), None)
    q = with_group(_query_names(spark, sf_dir), None)
    m_tf = explode_char_ngrams(m, "id", "name")
    q_tf = explode_char_ngrams(q, "id", "name")
    idf = idf_table(m_tf, doc_count_table(m, "id"))
    return master_weights(m_tf, idf), query_weights(q_tf, idf), idf


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_normalize(spark, sf_dir):
    from name_matching_spark.functions.normalize import normalize_basic

    d = _read(spark, sf_dir, "documents")
    return d.select("doc_id",
                    normalize_basic(F.col("text")).alias("name_norm"))


def _q_ngram_df(spark, sf_dir):
    from name_matching_spark.operators.tfidf import (explode_char_ngrams,
                                                     with_group)

    p = with_group(_part_names(spark, sf_dir), None)
    tf = explode_char_ngrams(p, "id", "name", (2, 2))
    return tf.groupBy("ngram").agg(F.count(F.lit(1)).alias("df"))


def _q_tfidf_weights(spark, sf_dir):
    m_w, _, _ = _tfidf_parts(spark, sf_dir)
    return m_w.select("id", "ngram",
                      F.round("weight", 6).alias("weight"))


def _q_cosine_topk(spark, sf_dir):
    from name_matching_spark.operators.blocking import cosine_top_n

    m_w, q_w, _ = _tfidf_parts(spark, sf_dir)
    top = cosine_top_n(q_w, m_w, top_n=3, round_decimals=9)
    return top.select("qid", "mid", "rank")


def _q_prefix_cosine_topk(spark, sf_dir):
    """Scale-path blocker: prefix-filtered candidates + exact cosine."""
    from name_matching_spark.operators.blocking import prefix_filtered_top_n

    m_w, q_w, idf = _tfidf_parts(spark, sf_dir)
    top = prefix_filtered_top_n(q_w, m_w, idf, top_n=3, prefix_size=6,
                                df_cap_frac=None, round_decimals=9)
    return top.select("qid", "mid", "rank")


def _q_exact_join(spark, sf_dir):
    p = _read(spark, sf_dir, "part")
    a = p.select(F.col("p_partkey").alias("a_id"),
                 F.col("p_name").alias("name"))
    b = p.select(F.col("p_partkey").alias("b_id"),
                 F.col("p_name").alias("name"))
    return (a.join(b, "name").filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id", "name"))


def _q_anti_join(spark, sf_dir):
    """O9 shape: rows of the left table with no exact partner on the right
    (customers without orders -- guaranteed non-empty in TPC-H data)."""
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 50 == 0).select(
        F.col("o_custkey").alias("c_custkey"))
    return (c.join(o, "c_custkey", "left_anti")
            .select(F.col("c_custkey").alias("id")))


def _q_group_exact_join(spark, sf_dir):
    p = _read(spark, sf_dir, "part")
    a = p.select(F.col("p_partkey").alias("a_id"), "p_brand",
                 F.col("p_name").alias("name"))
    b = p.select(F.col("p_partkey").alias("b_id"), "p_brand",
                 F.col("p_name").alias("name"))
    return (a.join(b, ["p_brand", "name"])
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id", F.col("p_brand").alias("block_key")))


def _q_word_counts(spark, sf_dir):
    d = _read(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    )


def _q_common_word_cutoff(spark, sf_dir):
    counts = _q_word_counts(spark, sf_dir)
    mx = counts.agg(F.max("cnt").alias("mx"))
    return (counts.crossJoin(F.broadcast(mx))
            .filter(F.col("cnt") > F.col("mx") * 0.1)
            .select("word", "cnt"))


def _q_top_words_reduce(spark, sf_dir):
    d = _read(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    ww = words.join(F.broadcast(counts), "word")
    doc_min = ww.groupBy("doc_id").agg(F.min("cnt").alias("min_cnt"))
    kept = ww.join(F.broadcast(doc_min), "doc_id").filter(
        F.col("cnt") < 3 * F.col("min_cnt"))
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda s: s["word"]),
            " ").alias("reduced_text"))


def _q_connected_components(spark, sf_dir):
    from name_matching_spark.operators.cluster import connected_components

    o = _read(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    edges = o.select(F.col("o_custkey").cast("long").alias("src"),
                     (F.col("o_orderkey") + 1000000).cast("long").alias("dst"))
    return connected_components(edges)


def _q_exact_dedup(spark, sf_dir):
    from name_matching_spark.operators.dedup import exact_duplicates

    return exact_duplicates(_docs_aug(spark, sf_dir), "doc_id", "text")


def _q_minhash_signatures(spark, sf_dir):
    from name_matching_spark.operators.dedup import (minhash_signatures,
                                                     word_shingles)

    d = _read(spark, sf_dir, "documents")
    sh = word_shingles(d, "doc_id", "text")
    # md5 oracle family: bit-identical to the DuckDB SQL; production runs
    # use the default xxhash64 int family (operators/dedup.py)
    sig = minhash_signatures(sh, num_hashes=8, hash_mode="md5")
    return sig.select("id", F.col("seed").cast("int").alias("seed"),
                      "minhash")


def _q_lsh_jaccard_pairs(spark, sf_dir):
    from name_matching_spark.operators.dedup import minhash_lsh_dedup

    pairs = minhash_lsh_dedup(_docs_aug(spark, sf_dir), "doc_id", "text",
                              num_hashes=8, bands=4, min_jaccard=0.3,
                              hash_mode="md5")
    return pairs.select("id_a", "id_b",
                        F.round("jaccard", 6).alias("jaccard"))


def _q_langid(spark, sf_dir):
    from name_matching_spark.operators.textstats import lang_id

    d = _read(spark, sf_dir, "documents")
    out = lang_id(d, "doc_id", "text")
    return out.select("id", "lang_pred",
                      F.col("lang_score").cast("int").alias("lang_score"))


def _q_langid_counts(spark, sf_dir):
    from name_matching_spark.operators.textstats import lang_id_counts

    d = _read(spark, sf_dir, "documents")
    return lang_id_counts(d, "doc_id", "text")


def _q_quality(spark, sf_dir):
    from name_matching_spark.operators.textstats import quality_score

    d = _read(spark, sf_dir, "documents")
    return quality_score(d, "doc_id", "text").select(
        "id", F.col("n_chars").cast("bigint").alias("n_chars"),
        "punct_ratio", "stop_ratio", "mean_word_len", "quality")


def _q_token_counts(spark, sf_dir):
    from name_matching_spark.operators.textstats import token_counts

    d = _read(spark, sf_dir, "documents")
    out = token_counts(d, "doc_id", "text")
    return out.select("id",
                      F.col("ws_tokens").cast("bigint").alias("ws_tokens"),
                      F.col("bpe_tokens").cast("bigint").alias("bpe_tokens"),
                      F.col("n_chars").cast("bigint").alias("n_chars"))


def _q_fingerprint(spark, sf_dir):
    from name_matching_spark.operators.textstats import fingerprint

    d = _read(spark, sf_dir, "documents")
    return fingerprint(d, "doc_id", "text")


def _q_ann_topk(spark, sf_dir):
    from name_matching_spark.operators.ann import brute_force_topk

    e = _read(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    return brute_force_topk(e, q, k=5, round_decimals=6)


# --- rows-only (not SQL-expressible: pandas-UDF metric ensemble etc.) ----

def _q_match_parts_e2e(spark, sf_dir):
    from name_matching_spark.pipeline import MatchConfig, match_names

    masters = _part_names(spark, sf_dir)
    queries = _query_names(spark, sf_dir)
    # prefix_size=6 forces the near-linear scale path (the block here is
    # below the auto-switch threshold); the decision-level oracle is exact,
    # so this also evidences that prefix blocking reproduces the exact
    # blocker's final match decisions on this corpus
    res = match_names(spark, queries, masters, "id", "name", "id", "name",
                      config=MatchConfig(threshold=50.0, top_n=10,
                                         prefix_size=6))
    return res.select("a_id", "b_id", F.round("score", 6).alias("score"),
                      "source")


def _q_match_parts_permetric(spark, sf_dir):
    """O18 per-metric ranking variant end to end: number_of_matches ==
    metric count (5 for the default ensemble) dispatches rate_matches'
    per-metric-column argmax -- one output slot per metric, run through
    the full pipeline (exact short-circuit + prefix blocking + ensemble
    scoring + threshold)."""
    from name_matching_spark.pipeline import MatchConfig, match_names

    masters = _part_names(spark, sf_dir)
    queries = _query_names(spark, sf_dir)
    res = match_names(spark, queries, masters, "id", "name", "id", "name",
                      config=MatchConfig(threshold=50.0, top_n=10,
                                         prefix_size=6,
                                         number_of_matches=5))
    return res.select("a_id", "b_id",
                      F.col("position").cast("int").alias("position"),
                      F.round("score", 6).alias("score"), "source")


def _q_match_parts_split(spark, sf_dir):
    """preprocess_split dispatch end to end: a second candidate search on
    common-word-reduced query names, candidate sets merged (max cosine,
    min rank) before scoring."""
    from name_matching_spark.pipeline import MatchConfig, match_names

    masters = _part_names(spark, sf_dir)
    queries = _query_names(spark, sf_dir)
    res = match_names(spark, queries, masters, "id", "name", "id", "name",
                      config=MatchConfig(threshold=50.0, top_n=10,
                                         prefix_size=6,
                                         preprocess_split=True))
    return res.select("a_id", "b_id", F.round("score", 6).alias("score"),
                      "source")


def _q_streaming_linkage(spark, sf_dir):
    """Structured-Streaming incremental linkage: the SAME query corpus as
    match_parts_e2e arrives as three file-source micro-batches; each is
    matched against the static masters via foreachBatch and appended to a
    checkpointed parquet sink.  Every blocking/scoring stage is fit on the
    master side only, so micro-batch boundaries cannot change decisions --
    the streamed output is value-oracled against the SAME expected table
    as the one-shot batch run."""
    import shutil
    import tempfile

    from name_matching_spark.pipeline import MatchConfig
    from name_matching_spark.streaming.incremental import (
        incremental_match, stream_pages, write_query_segments)

    masters = _part_names(spark, sf_dir)
    queries = _query_names(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="nm_stream_entry_")
    seg_dir = os.path.join(root, "segments")
    out_dir = os.path.join(root, "matches")
    ckpt_dir = os.path.join(root, "ckpt")
    write_query_segments(queries, seg_dir, n_segments=3)
    stream = stream_pages(spark, seg_dir, schema="id bigint, name string",
                          max_files_per_trigger=1)
    incremental_match(
        stream, masters, "id", "name", "id", "name",
        output_dir=out_dir, checkpoint_dir=ckpt_dir,
        config=MatchConfig(threshold=50.0, top_n=10, prefix_size=6))
    res = spark.read.parquet(out_dir).select(
        "a_id", "b_id", F.round("score", 6).alias("score"), "source")
    # localCheckpoint (not persist): truncates lineage so the result
    # survives the tmp-dir cleanup even if the cache is evicted later
    res = res.localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return res


def _q_optimiser_predict(spark, sf_dir):
    """O29 fit->predict end to end (reference NameMatchingOptimiser,
    name_matching_optimiser.py:188-261,591-621): a labeled pair fixture --
    each truncated query vs its true master (label 1) and vs the next
    query's master (label 0) -- is scored with the 5-metric ensemble
    (score_candidates keep_scores), fed to the seed-pinned
    StandardScaler+GBT fit on ONE sorted partition (so the fit is
    independent of session parallelism / input split order), and the
    fitted model's per-query argmax predictions are returned.

    Oracle: expected table pinned by tools/gen_expected.py.  GBT
    internals are not DuckDB-expressible, so unlike the NumPy-oracle
    e2e tables this one is a REGRESSION pin (generated by this same
    path, then held fixed): the gate still value-checks that the whole
    fit->predict surface reproduces bit-stable probabilities run over
    run and session over session."""
    from pyspark.sql import Window

    from name_matching_spark.operators.optimiser import (
        fit_optimiser, predict_matches)
    from name_matching_spark.operators.scoring import score_candidates

    masters = _part_names(spark, sf_dir)
    queries_df = _query_names(spark, sf_dir)
    w_next = Window.orderBy("id")
    w_all = w_next.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
    neg_map = queries_df.select("id").withColumn(
        "neg_id", F.coalesce(F.lead("id").over(w_next),
                             F.min("id").over(w_all)))
    pos = (
        queries_df.alias("q")
        .join(masters.alias("m"), F.col("q.id") == F.col("m.id"))
        .select(F.col("q.id").alias("qid"), F.col("m.id").alias("mid"),
                F.col("q.name").alias("query_name"),
                F.col("m.name").alias("cand_name"),
                F.lit(1).alias("label")))
    neg = (
        queries_df.join(neg_map, "id")
        .join(masters.select(F.col("id").alias("neg_id"),
                             F.col("name").alias("cand_name")), "neg_id")
        .select(F.col("id").alias("qid"), F.col("neg_id").alias("mid"),
                F.col("name").alias("query_name"), "cand_name",
                F.lit(0).alias("label")))
    scored = score_candidates(pos.unionByName(neg), keep_scores=True)
    train = scored.coalesce(1).sortWithinPartitions("qid", "mid")
    model = fit_optimiser(train, max_iter=10)
    pred = predict_matches(model, scored, threshold=0.5)
    return pred.select("qid", "mid", "label",
                       F.round("match_prob", 9).alias("match_prob"))


def _q_annotation_queue(spark, sf_dir):
    """O30 (batch-first): ambiguous-match labeling queue over the
    per-metric match run -- band preselect on each query's best score
    (70 < max < 100) + deterministic md5-bucket sampling of half the
    queries.  Value-oracled: same SQL over the same expected table."""
    from name_matching_spark.operators.annotate import annotation_queue

    m = _q_match_parts_permetric(spark, sf_dir)
    return annotation_queue(m, lower_bound=70.0, data_percentage=0.5,
                            seed=7)


def _q_simhash(spark, sf_dir):
    from name_matching_spark.operators.dedup import simhash

    d = _read(spark, sf_dir, "documents")
    return simhash(d, "doc_id", "text")


def _q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs via 16-bit chunk buckets + hamming filter
    over the augmented (twin-containing) docs corpus."""
    from name_matching_spark.operators.dedup import simhash_near_dups

    d = _docs_aug(spark, sf_dir)
    out = simhash_near_dups(d, "doc_id", "text", max_hamming=12)
    return out.select("id_a", "id_b",
                      F.col("hamming").cast("int").alias("hamming"))


def _q_ann_lsh(spark, sf_dir):
    from name_matching_spark.operators.ann import lsh_bucket_topk

    e = _read(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    return lsh_bucket_topk(e, q, k=5, dim=64, num_planes=6, num_tables=4,
                           round_decimals=6)


def _q_emb_near_dups(spark, sf_dir):
    """Embedding near-dup at scale: LSH sign-bucket self-join candidates +
    exact-cosine verify (bucket-local, not all-pairs) over the augmented
    (twin-containing) embeddings."""
    from name_matching_spark.operators.ann import embedding_near_dups_lsh

    e = _emb_aug(spark, sf_dir)
    return embedding_near_dups_lsh(
        e, id_col="vec_id", vec_col="v", min_cosine=0.9,
        dim=64, num_planes=4, num_tables=8, round_decimals=6)


def _q_ann_ivf(spark, sf_dir):
    from name_matching_spark.operators.ann import ivf_topk

    e = _read(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    return ivf_topk(e, q, k=5, n_cells=16, n_probe=4)


def _q_media_meta(spark, sf_dir):
    from name_matching_spark.operators.multimodal import decode_media

    d = _read(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return decode_media(d, "doc_id", "payload")


def _q_media_resize(spark, sf_dir):
    """Resize plumbing over binary payloads (deterministic fake resizer;
    binary column kept operator-side, byte accounting oracled)."""
    from name_matching_spark.operators.multimodal import resize_media

    d = _read(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    out = resize_media(d, "doc_id", "payload", width=64, height=48)
    return out.select("id", "width", "height", "byte_len")


def _q_media_frames(spark, sf_dir):
    """Frame-sampling plumbing: 4 deterministic frame keys per payload
    (md5(payload||':'||idx) -- SQL-reproducible)."""
    from name_matching_spark.operators.multimodal import sample_frames

    d = _read(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    out = sample_frames(d, "doc_id", "payload", n_frames=4)
    return out.select("id", "frame_idx", "frame_key")


def _q_rated_matches_groups(spark, sf_dir):
    """O18 per-group ranking variant (number_of_matches == metric-group
    count): pseudo-score arrays derived from md5 so DuckDB reproduces the
    exact values; groups = [1, 2], one winner per group per query."""
    from pyspark.sql import Window

    from name_matching_spark.operators.scoring import rate_matches
    from name_matching_spark.operators.tfidf import GROUP_COL

    o = _read(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 50).alias("qid"),
        F.col("o_orderkey").alias("mid"))
    h = F.md5(F.col("mid").cast("string"))

    def s(pos):
        return (F.conv(F.substring(h, pos, 4), 16, 10).cast("double")
                / 65535.0)

    w = Window.partitionBy("qid").orderBy("mid")
    scored = (
        o.withColumn(GROUP_COL, F.lit(""))
        .withColumn("scores", F.array(s(1), s(5), s(9)))
        .withColumn("rank", F.row_number().over(w))
        .withColumn("mean_score",
                    (F.col("scores")[0] + F.col("scores")[1]
                     + F.col("scores")[2]) / 3)
    )
    out = rate_matches(scored, number_of_matches=2, group_sizes=[1, 2])
    return out.select("qid", F.col("position").cast("int").alias("position"),
                      "mid", F.round("score", 6).alias("score"))


def _q_cluster_pages(spark, sf_dir):
    """Flagship shape: extract -> link -> transitively cluster synthetic
    pages (deterministic generator, twin variants per entity)."""
    from name_matching_spark.pipeline import MatchConfig, match_pages
    from name_matching_spark.sources.pages import spark_pages_df

    pages = spark_pages_df(spark, entities=40, variants=2)
    a = pages.filter(F.col("variant_id") == 1)
    b = pages.filter(F.col("variant_id") == 0)
    return match_pages(spark, a, b, config=MatchConfig(threshold=50.0),
                       cluster=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "normalize_names": _q_normalize,
        "ngram_df": _q_ngram_df,
        "tfidf_master_weights": _q_tfidf_weights,
        "cosine_topk": _q_cosine_topk,
        "prefix_cosine_topk": _q_prefix_cosine_topk,
        "exact_join": _q_exact_join,
        "anti_join": _q_anti_join,
        "group_exact_join": _q_group_exact_join,
        "word_counts": _q_word_counts,
        "common_word_cutoff": _q_common_word_cutoff,
        "top_words_reduce": _q_top_words_reduce,
        "connected_components": _q_connected_components,
        "exact_dedup": _q_exact_dedup,
        "minhash_signatures": _q_minhash_signatures,
        "lsh_jaccard_pairs": _q_lsh_jaccard_pairs,
        "langid": _q_langid,
        "langid_counts": _q_langid_counts,
        "quality_score": _q_quality,
        "token_counts": _q_token_counts,
        "fingerprint": _q_fingerprint,
        "ann_topk": _q_ann_topk,
        # value-oracled via generated SQL / expected tables
        "rated_matches_groups": _q_rated_matches_groups,
        "match_parts_e2e": _q_match_parts_e2e,
        "streaming_linkage_e2e": _q_streaming_linkage,
        "match_parts_permetric_e2e": _q_match_parts_permetric,
        "annotation_queue": _q_annotation_queue,
        "optimiser_predict": _q_optimiser_predict,
        "match_parts_split_e2e": _q_match_parts_split,
        "simhash_docs": _q_simhash,
        "simhash_pairs": _q_simhash_pairs,
        "ann_lsh_topk": _q_ann_lsh,
        "emb_near_dups_lsh": _q_emb_near_dups,
        "ann_ivf_topk": _q_ann_ivf,
        "media_meta": _q_media_meta,
        "media_resize": _q_media_resize,
        "media_frames": _q_media_frames,
        "cluster_pages_e2e": _q_cluster_pages,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_NORM = ("lower(trim(regexp_replace(regexp_replace(text, "
         "'[^\\w\\-\\&\\#]', ' ', 'g'), '\\s+', ' ', 'g')))")

_SHINGLES_SQL = r"""
    w AS (
        SELECT id,
               string_split(trim(regexp_replace(lower(text), '\s+', ' ',
                                                'g')), ' ') AS ws
        FROM docs
    ),
    sh AS (
        SELECT DISTINCT id,
               ws[t.i] || ' ' || ws[t.i + 1] || ' ' || ws[t.i + 2] AS shingle
        FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - 2))
                         AS i) t
        WHERE len(ws) >= 3
    )
"""


def _simhash_sql(docs_sql: str) -> str:
    """DuckDB twin of operators/dedup.py::simhash over an arbitrary
    (doc_id, text) source: md5-prefix token hashes, 64-way bit vote."""
    return f"""
            WITH docs AS ({docs_sql}),
            toks AS (
                SELECT doc_id AS id,
                       unnest(string_split_regex(trim(lower(text)), '\\s+'))
                           AS tok
                FROM docs
                WHERE length(trim(text)) > 0
            ),
            th AS (
                SELECT id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
                FROM toks
            ),
            bits AS (
                SELECT id, b.bit,
                       sum(CASE WHEN (h >> b.bit) & 1 = 1
                                THEN 1 ELSE -1 END) AS vote
                FROM th, (SELECT unnest(range(64)) AS bit) b
                GROUP BY id, b.bit
            ),
            vals AS (
                SELECT id,
                       sum(CASE WHEN vote > 0
                                THEN (1::UBIGINT << bit)::HUGEINT
                                ELSE 0 END) AS u
                FROM bits GROUP BY id
            )
            SELECT d.doc_id AS id,
                   CAST(CASE WHEN v.u IS NULL THEN 0
                             WHEN v.u >= 9223372036854775808
                               THEN v.u - 18446744073709551616
                             ELSE v.u END AS BIGINT) AS simhash
            FROM docs d LEFT JOIN vals v ON v.id = d.doc_id
        """


def _simhash_pairs_sql(max_hamming: int = 12) -> str:
    """DuckDB twin of operators/dedup.py::simhash_near_dups over the
    augmented docs corpus: 4 x 16-bit chunk buckets -> candidate pairs ->
    hamming filter (arithmetic >> is safe: & 65535 truncates the
    sign-extended high bits)."""
    inner = _simhash_sql(_DOCS_AUG_SQL)
    return f"""
            WITH sh AS ({inner}),
            chunks AS (
                SELECT id, simhash,
                       t.i AS chunk, (simhash >> (16 * t.i)) & 65535 AS v
                FROM sh, (SELECT unnest(range(4)) AS i) t
            ),
            cand AS (
                SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                       a.simhash AS ha, b.simhash AS hb
                FROM chunks a
                JOIN chunks b ON a.chunk = b.chunk AND a.v = b.v
                             AND a.id < b.id
            )
            SELECT id_a, id_b,
                   CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
            FROM cand WHERE bit_count(xor(ha, hb)) <= {max_hamming}
        """


def _langid_sql() -> str:
    """DuckDB twin of operators/textstats.py::lang_id, GENERATED from the
    same LANG_MARKERS table so Spark and oracle cannot drift."""
    from name_matching_spark.operators.textstats import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    score_cols = []
    for lang in langs:
        cases = " +\n                   ".join(
            f"CASE WHEN contains(p, ' {w} ') THEN 1 ELSE 0 END"
            for w in LANG_MARKERS[lang])
        score_cols.append(f"({cases}) AS s_{lang}")
    score_sql = ",\n                  ".join(score_cols)
    greatest = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    # CASE <greatest> WHEN s_xx picks the FIRST equal score in listed
    # (alphabetical) order -- the same tie-break as the Spark operator
    whens = " ".join(f"WHEN s_{lang} THEN '{lang}'" for lang in langs[:-1])
    return f"""
            WITH s AS (
                SELECT doc_id AS id, ' ' || lower(text) || ' ' AS p
                FROM documents
            ),
            sc AS (
                SELECT id,
                  {score_sql}
                FROM s
            )
            SELECT id,
                   CASE {greatest} {whens}
                        ELSE '{langs[-1]}' END AS lang_pred,
                   CAST({greatest} AS INT) AS lang_score
            FROM sc
        """


def _langid_counts_sql() -> str:
    """DuckDB twin of operators/textstats.py::lang_id_counts, GENERATED
    from the same LANG_MARKERS table (marker VALUES list embedded)."""
    from name_matching_spark.operators.textstats import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    values = ", ".join(f"('{lang}', '{w}')"
                       for lang in langs for w in LANG_MARKERS[lang])
    return f"""
            WITH m(lang, word) AS (VALUES {values}),
            w AS (
                SELECT doc_id AS id,
                       unnest(regexp_extract_all(lower(text), '[a-z]+'))
                           AS word
                FROM documents
            ),
            c AS (
                SELECT id, lang, count(*) AS cnt
                FROM w JOIN m USING (word) GROUP BY id, lang
            ),
            r AS (
                SELECT id, lang, cnt,
                       row_number() OVER (PARTITION BY id
                           ORDER BY cnt DESC, lang ASC) AS rn
                FROM c
            )
            SELECT d.doc_id AS id,
                   coalesce(r.lang, '{langs[0]}') AS lang_pred,
                   CAST(coalesce(r.cnt, 0) AS INT) AS lang_score
            FROM documents d
            LEFT JOIN (SELECT * FROM r WHERE rn = 1) r ON r.id = d.doc_id
        """


def _ann_lsh_sql(k: int = 5, dim: int = 64, num_planes: int = 6,
                 num_tables: int = 4) -> str:
    """DuckDB twin of operators/ann.py::lsh_bucket_topk, GENERATED from the
    same md5-deterministic ``_hyperplane`` table: the plane components are
    embedded as SQL double literals (repr round-trips exactly), so bucket
    assignment cannot drift between engines.  Plane dots are rounded to 9
    decimals before the sign test and cosines to 6 before ranking, matching
    the Spark operator."""
    from name_matching_spark.operators.ann import _hyperplane

    def sig_expr(vcol: str, table: int) -> str:
        bits = []
        for p in range(num_planes):
            plane = _hyperplane(table * 1000 + p, dim)
            lits = ", ".join(repr(x) for x in plane)
            bits.append(
                f"(CASE WHEN round(list_dot_product({vcol}, [{lits}]), 9)"
                f" >= 0 THEN '1' ELSE '0' END)")
        joined = " || ".join(bits)
        return f"'t{table}:' || {joined}"

    v_sigs = ", ".join(sig_expr("vec", t) for t in range(num_tables))
    q_sigs = ", ".join(sig_expr("qv", t) for t in range(num_tables))
    return f"""
            WITH v AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE))
                           AS vec
                FROM embeddings
            ),
            q AS (SELECT vec_id AS qid, vec AS qv FROM v
                  WHERE vec_id < 10),
            vb AS (
                SELECT vec_id, vec, unnest([{v_sigs}]) AS bucket FROM v
            ),
            qb AS (
                SELECT qid, qv, unnest([{q_sigs}]) AS bucket FROM q
            ),
            cand AS (
                SELECT DISTINCT qb.qid, qb.qv, vb.vec_id, vb.vec
                FROM qb JOIN vb USING (bucket)
            ),
            scored AS (
                SELECT qid, vec_id,
                       round(list_cosine_similarity(qv, vec), 6) AS cosine
                FROM cand
            ),
            ranked AS (
                SELECT qid, vec_id,
                       row_number() OVER (PARTITION BY qid
                           ORDER BY cosine DESC, vec_id ASC) AS rank
                FROM scored
            )
            SELECT qid, vec_id, CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= {k}
        """


def _emb_near_dup_sql(min_cosine: float = 0.9, dim: int = 64,
                      num_planes: int = 4, num_tables: int = 8) -> str:
    """DuckDB twin of operators/ann.py::embedding_near_dups_lsh over the
    augmented embeddings -- GENERATED from the same md5-deterministic
    hyperplane table (plane components as double literals), same 9-dp
    sign-test rounding, cosine rounded to 6 before the threshold."""
    from name_matching_spark.operators.ann import _hyperplane

    def sig_expr(vcol: str, table: int) -> str:
        bits = []
        for p in range(num_planes):
            plane = _hyperplane(table * 1000 + p, dim)
            lits = ", ".join(repr(x) for x in plane)
            bits.append(
                f"(CASE WHEN round(list_dot_product({vcol}, [{lits}]), 9)"
                f" >= 0 THEN '1' ELSE '0' END)")
        joined = " || ".join(bits)
        return f"'t{table}:' || {joined}"

    sigs = ", ".join(sig_expr("v", t) for t in range(num_tables))
    return f"""
            WITH e AS ({_EMB_AUG_SQL}),
            vb AS (
                SELECT vec_id, v, unnest([{sigs}]) AS bucket FROM e
            ),
            cand AS (
                SELECT DISTINCT a.vec_id AS id_a, a.v AS va,
                                b.vec_id AS id_b, b.v AS vb
                FROM vb a JOIN vb b USING (bucket)
                WHERE a.vec_id < b.vec_id
            ),
            scored AS (
                SELECT id_a, id_b,
                       round(list_cosine_similarity(va, vb), 6) AS cosine
                FROM cand
            )
            SELECT id_a, id_b, cosine FROM scored
            WHERE cosine >= {min_cosine}
        """


def oracle_sql() -> dict[str, str]:
    return {
        "normalize_names": f"SELECT doc_id, {_NORM} AS name_norm FROM documents",
        "ngram_df": """
            WITH g AS (
                SELECT p_partkey AS id, substring(p_name, t.i, 2) AS ngram
                FROM part, LATERAL (SELECT unnest(generate_series(1,
                     length(p_name) - 1)) AS i) t
            )
            SELECT ngram, count(DISTINCT id) AS df FROM g GROUP BY ngram
        """,
        "tfidf_master_weights": f"""
            WITH grams AS ({_PART_GRAMS_SQL}),
            tf AS (SELECT id, ngram, CAST(count(*) AS DOUBLE) AS tf
                   FROM grams GROUP BY id, ngram),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM part),
            idf AS (SELECT ngram,
                           ln((1 + n.n_docs) / (1 + count(*))) + 1 AS idf
                    FROM tf, n GROUP BY ngram, n.n_docs),
            wt AS (SELECT tf.id, tf.ngram, tf.tf * idf.idf AS tfidf
                   FROM tf JOIN idf USING (ngram)),
            s AS (SELECT id, sum(tfidf) AS st FROM wt GROUP BY id)
            SELECT wt.id, wt.ngram, round(wt.tfidf / s.st, 6) AS weight
            FROM wt JOIN s USING (id)
        """,
        "cosine_topk": f"""
            WITH grams AS ({_PART_GRAMS_SQL}),
            tf AS (SELECT id, ngram, CAST(count(*) AS DOUBLE) AS tf
                   FROM grams GROUP BY id, ngram),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM part),
            idf AS (SELECT ngram,
                           ln((1 + n.n_docs) / (1 + count(*))) + 1 AS idf
                    FROM tf, n GROUP BY ngram, n.n_docs),
            wt AS (SELECT tf.id, tf.ngram, tf.tf * idf.idf AS tfidf
                   FROM tf JOIN idf USING (ngram)),
            s AS (SELECT id, sum(tfidf) AS st FROM wt GROUP BY id),
            mw AS (SELECT wt.id, wt.ngram, wt.tfidf / s.st AS weight
                   FROM wt JOIN s USING (id)),
            qnames AS ({_QUERY_NAMES_SQL}),
            qg AS (
                SELECT id, substring(name, t.i, 2) AS ngram FROM qnames,
                LATERAL (SELECT unnest(generate_series(1, length(name) - 1))
                         AS i) t
                UNION ALL
                SELECT id, substring(name, t.i, 3) AS ngram FROM qnames,
                LATERAL (SELECT unnest(generate_series(1, length(name) - 2))
                         AS i) t
                WHERE length(name) >= 3
            ),
            qtf AS (SELECT id, ngram, CAST(count(*) AS DOUBLE) AS tf
                    FROM qg GROUP BY id, ngram),
            qw0 AS (SELECT qtf.id, qtf.ngram, qtf.tf * idf.idf AS tfidf
                    FROM qtf JOIN idf USING (ngram)),
            qs AS (SELECT id, sqrt(sum(tfidf * tfidf)) AS l2
                   FROM qw0 GROUP BY id),
            qw AS (SELECT qw0.id, qw0.ngram, qw0.tfidf / qs.l2 AS weight
                   FROM qw0 JOIN qs USING (id)),
            cos AS (
                SELECT qw.id AS qid, mw.id AS mid,
                       round(sum(qw.weight * mw.weight), 9) AS cosine
                FROM qw JOIN mw ON qw.ngram = mw.ngram
                GROUP BY qw.id, mw.id
            ),
            ranked AS (
                SELECT qid, mid,
                       row_number() OVER (PARTITION BY qid
                           ORDER BY cosine DESC, mid ASC) AS rank
                FROM cos
            )
            SELECT qid, mid, CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= 3
        """,
        "prefix_cosine_topk": f"""
            WITH grams AS ({_PART_GRAMS_SQL}),
            tf AS (SELECT id, ngram, CAST(count(*) AS DOUBLE) AS tf
                   FROM grams GROUP BY id, ngram),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM part),
            dfreq AS (SELECT ngram, CAST(count(*) AS DOUBLE) AS df
                      FROM tf GROUP BY ngram),
            idf AS (SELECT dfreq.ngram, dfreq.df,
                           ln((1 + n.n_docs) / (1 + dfreq.df)) + 1 AS idf
                    FROM dfreq, n),
            wt AS (SELECT tf.id, tf.ngram, tf.tf * idf.idf AS tfidf
                   FROM tf JOIN idf USING (ngram)),
            s AS (SELECT id, sum(tfidf) AS st FROM wt GROUP BY id),
            mw AS (SELECT wt.id, wt.ngram, wt.tfidf / s.st AS weight
                   FROM wt JOIN s USING (id)),
            qnames AS ({_QUERY_NAMES_SQL}),
            qg AS (
                SELECT id, substring(name, t.i, 2) AS ngram FROM qnames,
                LATERAL (SELECT unnest(generate_series(1, length(name) - 1))
                         AS i) t
                UNION ALL
                SELECT id, substring(name, t.i, 3) AS ngram FROM qnames,
                LATERAL (SELECT unnest(generate_series(1, length(name) - 2))
                         AS i) t
                WHERE length(name) >= 3
            ),
            qtf AS (SELECT id, ngram, CAST(count(*) AS DOUBLE) AS tf
                    FROM qg GROUP BY id, ngram),
            qw0 AS (SELECT qtf.id, qtf.ngram, qtf.tf * idf.idf AS tfidf
                    FROM qtf JOIN idf USING (ngram)),
            qs AS (SELECT id, sqrt(sum(tfidf * tfidf)) AS l2
                   FROM qw0 GROUP BY id),
            qw AS (SELECT qw0.id, qw0.ngram, qw0.tfidf / qs.l2 AS weight
                   FROM qw0 JOIN qs USING (id)),
            qpref AS (
                SELECT id, ngram FROM (
                    SELECT qw.id, qw.ngram,
                           row_number() OVER (PARTITION BY qw.id
                               ORDER BY idf.df ASC, qw.ngram ASC) AS r
                    FROM qw JOIN idf USING (ngram)
                ) WHERE r <= 6
            ),
            mpref AS (
                SELECT id, ngram FROM (
                    SELECT mw.id, mw.ngram,
                           row_number() OVER (PARTITION BY mw.id
                               ORDER BY idf.df ASC, mw.ngram ASC) AS r
                    FROM mw JOIN idf USING (ngram)
                ) WHERE r <= 6
            ),
            cand AS (
                SELECT DISTINCT q.id AS qid, m.id AS mid
                FROM qpref q JOIN mpref m USING (ngram)
            ),
            cos AS (
                SELECT c.qid, c.mid,
                       round(sum(qw.weight * mw.weight), 9) AS cosine
                FROM cand c
                JOIN qw ON qw.id = c.qid
                JOIN mw ON mw.id = c.mid AND mw.ngram = qw.ngram
                GROUP BY c.qid, c.mid
            ),
            ranked AS (
                SELECT qid, mid,
                       row_number() OVER (PARTITION BY qid
                           ORDER BY cosine DESC, mid ASC) AS rank
                FROM cos WHERE cosine > 0
            )
            SELECT qid, mid, CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= 3
        """,
        "exact_join": """
            SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
                   a.p_name AS name
            FROM part a JOIN part b
              ON a.p_name = b.p_name AND a.p_partkey < b.p_partkey
        """,
        "anti_join": """
            SELECT c_custkey AS id FROM customer c
            WHERE NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderkey % 50 = 0)
        """,
        "group_exact_join": """
            SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
                   a.p_brand AS block_key
            FROM part a JOIN part b
              ON a.p_brand = b.p_brand AND a.p_name = b.p_name
             AND a.p_partkey < b.p_partkey
        """,
        "word_counts": """
            WITH t AS (SELECT unnest(string_split(lower(text), ' ')) AS word
                       FROM documents)
            SELECT word, count(*) AS cnt FROM t
            WHERE word <> '' GROUP BY word
        """,
        "common_word_cutoff": """
            WITH t AS (SELECT unnest(string_split(lower(text), ' ')) AS word
                       FROM documents),
            c AS (SELECT word, count(*) AS cnt FROM t
                  WHERE word <> '' GROUP BY word)
            SELECT word, cnt FROM c
            WHERE cnt > (SELECT max(cnt) FROM c) * 0.1
        """,
        "top_words_reduce": """
            WITH words AS (
                SELECT doc_id, t.pos, t.word
                FROM documents,
                LATERAL (SELECT unnest(string_split(lower(text), ' '))
                         AS word,
                         unnest(generate_series(1,
                             len(string_split(lower(text), ' ')))) AS pos) t
                WHERE t.word <> ''
            ),
            counts AS (SELECT word, count(*) AS cnt FROM words GROUP BY word),
            ww AS (SELECT w.doc_id, w.pos, w.word, c.cnt
                   FROM words w JOIN counts c USING (word)),
            doc_min AS (SELECT doc_id, min(cnt) AS min_cnt
                        FROM ww GROUP BY doc_id)
            SELECT ww.doc_id,
                   string_agg(ww.word, ' ' ORDER BY ww.pos) AS reduced_text
            FROM ww JOIN doc_min USING (doc_id)
            WHERE ww.cnt < 3 * doc_min.min_cnt
            GROUP BY ww.doc_id
        """,
        "connected_components": """
            WITH RECURSIVE e AS (
                SELECT CAST(o_custkey AS BIGINT) AS src,
                       CAST(o_orderkey + 1000000 AS BIGINT) AS dst
                FROM orders WHERE o_orderkey % 11 = 0
            ),
            sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
            nodes AS (SELECT DISTINCT src AS id FROM sym),
            reach(id, r) AS (
                SELECT id, id FROM nodes
                UNION
                SELECT reach.id, sym.dst FROM reach
                JOIN sym ON sym.src = reach.r
            )
            SELECT id, min(r) AS component FROM reach GROUP BY id
        """,
        "exact_dedup": f"""
            WITH docs AS ({_DOCS_AUG_SQL}),
            h AS (SELECT doc_id AS id, md5(text) AS content_hash FROM docs),
            g AS (SELECT content_hash, min(id) AS keeper_id,
                         count(*) AS c
                  FROM h GROUP BY content_hash)
            SELECT h.id, g.keeper_id, h.content_hash
            FROM h JOIN g USING (content_hash) WHERE g.c > 1
        """,
        "minhash_signatures": f"""
            WITH docs AS (SELECT doc_id AS id, text FROM documents),
            {_SHINGLES_SQL}
            SELECT id, CAST(s.seed AS INT) AS seed,
                   min(md5(CAST(s.seed AS VARCHAR) || '|' || shingle))
                       AS minhash
            FROM sh, (SELECT unnest(generate_series(0, 7)) AS seed) s
            GROUP BY id, s.seed
        """,
        "lsh_jaccard_pairs": f"""
            WITH docs AS (SELECT doc_id AS id, text
                          FROM ({_DOCS_AUG_SQL})),
            {_SHINGLES_SQL},
            mh AS (
                SELECT id, CAST(s.seed AS INT) AS seed,
                       min(md5(CAST(s.seed AS VARCHAR) || '|' || shingle))
                           AS minhash
                FROM sh, (SELECT unnest(generate_series(0, 7)) AS seed) s
                GROUP BY id, s.seed
            ),
            bh AS (
                SELECT id, seed % 4 AS band,
                       md5(string_agg(CAST(seed AS VARCHAR) || ':' || minhash,
                           ',' ORDER BY CAST(seed AS VARCHAR) || ':'
                           || minhash)) AS bhash
                FROM mh GROUP BY id, seed % 4
            ),
            cand AS (
                SELECT DISTINCT a.id AS id_a, b.id AS id_b
                FROM bh a JOIN bh b
                  ON a.band = b.band AND a.bhash = b.bhash AND a.id < b.id
            ),
            sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
            inter AS (
                SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.id < b.id
                GROUP BY a.id, b.id
            )
            SELECT c.id_a, c.id_b,
                   round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
            FROM cand c
            JOIN inter ON inter.id_a = c.id_a AND inter.id_b = c.id_b
            JOIN sizes sa ON sa.id = c.id_a
            JOIN sizes sb ON sb.id = c.id_b
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.3
        """,
        "langid": _langid_sql(),
        "langid_counts": _langid_counts_sql(),
        "ann_lsh_topk": _ann_lsh_sql(),
        "emb_near_dups_lsh": _emb_near_dup_sql(),
        "quality_score": r"""
            WITH q AS (
                SELECT doc_id AS id, text,
                       length(text) AS n_chars,
                       len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text), '\s+'))
                       END AS n_words,
                       ' ' || lower(text) || ' ' AS p
                FROM documents
            ),
            r AS (
                SELECT id, n_chars,
                       round(CAST(n_punct AS DOUBLE)
                             / greatest(n_chars, 1), 6) AS punct_ratio,
                       round(CAST(
                         (CASE WHEN contains(p, ' the ') THEN 1 ELSE 0 END +
                          CASE WHEN contains(p, ' a ') THEN 1 ELSE 0 END +
                          CASE WHEN contains(p, ' an ') THEN 1 ELSE 0 END +
                          CASE WHEN contains(p, ' and ') THEN 1 ELSE 0 END +
                          CASE WHEN contains(p, ' or ') THEN 1 ELSE 0 END +
                          CASE WHEN contains(p, ' of ') THEN 1 ELSE 0 END +
                          CASE WHEN contains(p, ' to ') THEN 1 ELSE 0 END +
                          CASE WHEN contains(p, ' in ') THEN 1 ELSE 0 END +
                          CASE WHEN contains(p, ' is ') THEN 1 ELSE 0 END +
                          CASE WHEN contains(p, ' it ') THEN 1 ELSE 0 END)
                         AS DOUBLE) / 10, 6) AS stop_ratio,
                       (CASE WHEN contains(p, ' the ') THEN 1 ELSE 0 END +
                        CASE WHEN contains(p, ' a ') THEN 1 ELSE 0 END +
                        CASE WHEN contains(p, ' an ') THEN 1 ELSE 0 END +
                        CASE WHEN contains(p, ' and ') THEN 1 ELSE 0 END +
                        CASE WHEN contains(p, ' or ') THEN 1 ELSE 0 END +
                        CASE WHEN contains(p, ' of ') THEN 1 ELSE 0 END +
                        CASE WHEN contains(p, ' to ') THEN 1 ELSE 0 END +
                        CASE WHEN contains(p, ' in ') THEN 1 ELSE 0 END +
                        CASE WHEN contains(p, ' is ') THEN 1 ELSE 0 END +
                        CASE WHEN contains(p, ' it ') THEN 1 ELSE 0 END)
                           AS stop_hits,
                       round(CAST(n_chars - n_words + 1 AS DOUBLE)
                             / greatest(n_words, 1), 6) AS mean_word_len
                FROM q
            )
            SELECT id, CAST(n_chars AS BIGINT) AS n_chars, punct_ratio,
                   stop_ratio, mean_word_len,
                   round(
                     (CASE WHEN n_chars BETWEEN 50 AND 10000
                           THEN 0.25 ELSE 0.0 END)
                     + (CASE WHEN punct_ratio <= 0.2 THEN 0.25 ELSE 0.0 END)
                     + (CASE WHEN stop_hits > 0 THEN 0.25 ELSE 0.0 END)
                     + (CASE WHEN mean_word_len BETWEEN 2.5 AND 12
                             THEN 0.25 ELSE 0.0 END), 2) AS quality
            FROM r
        """,
        "ann_ivf_topk": """
            WITH v AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE))
                           AS vec
                FROM embeddings
            ),
            c AS (
                SELECT vec_id AS cid, vec AS cvec
                FROM v ORDER BY vec_id LIMIT 16
            ),
            assign AS (
                SELECT vec_id, vec, cid,
                       row_number() OVER (
                           PARTITION BY vec_id
                           ORDER BY round(list_cosine_similarity(vec, cvec),
                                          9) DESC, cid ASC) AS rn
                FROM v CROSS JOIN c
            ),
            inv AS (SELECT vec_id, vec, cid FROM assign WHERE rn = 1),
            q AS (SELECT vec_id AS qid, vec AS qv FROM v WHERE vec_id < 10),
            probes AS (
                SELECT qid, qv, cid,
                       row_number() OVER (
                           PARTITION BY qid
                           ORDER BY round(list_cosine_similarity(qv, cvec),
                                          9) DESC, cid ASC) AS rn
                FROM q CROSS JOIN c
            ),
            p AS (SELECT qid, qv, cid FROM probes WHERE rn <= 4),
            cand AS (
                SELECT p.qid, inv.vec_id,
                       round(list_cosine_similarity(p.qv, inv.vec), 9) AS cos
                FROM p JOIN inv USING (cid)
            ),
            ranked AS (
                SELECT qid, vec_id,
                       row_number() OVER (PARTITION BY qid
                                          ORDER BY cos DESC, vec_id ASC)
                           AS rank
                FROM cand
            )
            SELECT qid, vec_id, CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= 5
        """,
        "rated_matches_groups": r"""
            WITH s AS (
                SELECT o_custkey % 50 AS qid, o_orderkey AS mid,
                       ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                       1, 4))::INT / 65535.0 AS s1,
                       ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                       5, 4))::INT / 65535.0 AS s2,
                       ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                       9, 4))::INT / 65535.0 AS s3
                FROM orders
            ),
            r AS (
                SELECT *, row_number() OVER (PARTITION BY qid ORDER BY mid)
                       AS rnk
                FROM s
            ),
            g0 AS (
                SELECT qid, 0 AS position, mid,
                       (s1 + s2 + s3) / 3 AS mean,
                       row_number() OVER (PARTITION BY qid
                                          ORDER BY s1 DESC, rnk ASC) AS rn
                FROM r
            ),
            g1 AS (
                SELECT qid, 1 AS position, mid,
                       (s1 + s2 + s3) / 3 AS mean,
                       row_number() OVER (PARTITION BY qid
                                          ORDER BY (s2 + s3) / 2 DESC,
                                                   rnk ASC) AS rn
                FROM r
            )
            SELECT qid, CAST(position AS INT) AS position, mid,
                   round(mean * 100, 6) AS score
            FROM g0 WHERE rn = 1
            UNION ALL
            SELECT qid, CAST(position AS INT) AS position, mid,
                   round(mean * 100, 6) AS score
            FROM g1 WHERE rn = 1
        """,
        # decision-level oracles: the scoring kernel is not SQL-expressible,
        # so the expected tables are materialized from the dependency-free
        # NumPy oracle (nm_core/oracle.py, validated against the reference's
        # golden values) by tools/gen_expected.py at the driver's
        # correctness scale (sf0.01 / the deterministic pages corpus)
        "match_parts_e2e": """
            SELECT a_id, b_id, score, source
            FROM read_parquet('/root/repo/expected/match_parts_sf001.parquet')
        """,
        "streaming_linkage_e2e": """
            SELECT a_id, b_id, score, source
            FROM read_parquet('/root/repo/expected/match_parts_sf001.parquet')
        """,
        "match_parts_permetric_e2e": """
            SELECT a_id, b_id, position, score, source FROM read_parquet(
                '/root/repo/expected/match_parts_permetric_sf001.parquet')
        """,
        "match_parts_split_e2e": """
            SELECT a_id, b_id, score, source FROM read_parquet(
                '/root/repo/expected/match_parts_split_sf001.parquet')
        """,
        "annotation_queue": """
            WITH m AS (
                SELECT a_id, b_id, position, score, source
                FROM read_parquet(
                    '/root/repo/expected/match_parts_permetric_sf001.parquet')
            ),
            b AS (
                SELECT *, max(score) OVER (PARTITION BY a_id) AS max_scr
                FROM m
            )
            SELECT a_id, b_id, position, score, source FROM b
            WHERE max_scr > 70.0 AND max_scr < 100.0
              AND ('0x' || substr(md5(CAST(a_id AS VARCHAR) || ':7'),
                                  1, 8))::BIGINT % 100 < 50
        """,
        "cluster_pages_e2e": """
            SELECT id, component
            FROM read_parquet('/root/repo/expected/cluster_pages_40.parquet')
        """,
        "optimiser_predict": """
            -- regression pin PLUS an accuracy floor: the pin was
            -- materialized by the same fit->predict path it gates, so by
            -- itself it could pin a wrong-from-day-one fit.  The floor
            -- (>=95% of per-query argmax predictions must carry label 1)
            -- empties the oracle -- forcing a row-count mismatch against
            -- the Spark side -- if a regenerated pin ever encodes a fit
            -- whose predictions stopped agreeing with the fixture labels.
            WITH p AS (
                SELECT qid, mid, label, match_prob FROM read_parquet(
                    '/root/repo/expected/optimiser_predict_sf001.parquet')
            ),
            top AS (
                SELECT label,
                       row_number() OVER (PARTITION BY qid
                                          ORDER BY match_prob DESC,
                                                   mid ASC) AS rn
                FROM p
            ),
            acc AS (
                SELECT avg(CASE WHEN label = 1 THEN 1.0 ELSE 0.0 END) AS a
                FROM top WHERE rn = 1
            )
            SELECT qid, mid, label, match_prob FROM p
            WHERE (SELECT a FROM acc) >= 0.95
        """,
        "simhash_docs": _simhash_sql("SELECT doc_id, text FROM documents"),
        "simhash_pairs": _simhash_pairs_sql(),
        "media_meta": r"""
            SELECT CAST(doc_id AS VARCHAR) AS id,
                   CAST(octet_length(encode(text)) AS INT) AS byte_len,
                   CASE WHEN octet_length(encode(text)) = 0 THEN 'empty'
                        ELSE 'image/fake' END AS media_type,
                   CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 0
                             ELSE 16 + ('0x' || substr(md5(text), 1, 2))::INT
                                  % 240
                        END AS INT) AS width,
                   CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 0
                             ELSE 16 + ('0x' || substr(md5(text), 3, 2))::INT
                                  % 240
                        END AS INT) AS height,
                   octet_length(encode(text)) > 0 AS ok
            FROM documents
        """,
        "media_resize": r"""
            SELECT CAST(doc_id AS VARCHAR) AS id,
                   CAST(64 AS INT) AS width,
                   CAST(48 AS INT) AS height,
                   CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 0
                             ELSE 48 END AS INT) AS byte_len
            FROM documents
        """,
        "media_frames": r"""
            SELECT CAST(doc_id AS VARCHAR) AS id,
                   CAST(t.i AS INT) AS frame_idx,
                   md5(text || ':' || CAST(t.i AS VARCHAR)) AS frame_key
            FROM documents,
                 LATERAL (SELECT unnest(generate_series(0, 3)) AS i) t
        """,
        "token_counts": r"""
            SELECT doc_id AS id,
                   CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                             ELSE len(string_split_regex(trim(text), '\s+'))
                        END AS BIGINT) AS ws_tokens,
                   CAST(len(regexp_extract_all(text,
                        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
                        AS bpe_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM documents
        """,
        "fingerprint": f"""
            WITH docs AS (SELECT doc_id AS id, text FROM documents),
            {_SHINGLES_SQL}
            SELECT id, min(md5(shingle)) AS fingerprint FROM sh GROUP BY id
        """,
        "ann_topk": """
            WITH v AS (
                SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                       CAST(unnest(embedding) AS DOUBLE) AS x
                FROM embeddings
            ),
            norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm
                      FROM v GROUP BY vec_id),
            q AS (SELECT vec_id AS qid, i, x AS qx FROM v WHERE vec_id < 10),
            dots AS (
                SELECT q.qid, v.vec_id, sum(q.qx * v.x) AS dot
                FROM q JOIN v ON q.i = v.i
                GROUP BY q.qid, v.vec_id
            ),
            cos AS (
                SELECT d.qid, d.vec_id,
                       round(d.dot / (nq.nrm * nv.nrm), 6) AS cosine
                FROM dots d
                JOIN norms nq ON nq.vec_id = d.qid
                JOIN norms nv ON nv.vec_id = d.vec_id
            ),
            ranked AS (
                SELECT qid, vec_id,
                       row_number() OVER (PARTITION BY qid
                           ORDER BY cosine DESC, vec_id ASC) AS rank
                FROM cos
            )
            SELECT qid, vec_id, CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= 5
        """,
    }


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full record-linkage (exact short-circuit + TF-IDF blocking
    + metric-ensemble scoring + threshold) of perturbed part names against
    the part master at sf0.001."""
    return _q_match_parts_e2e(spark, "/root/testdata/sf0.001")
