"""Extra benchmarks: per-stage isolation + plan capture (guide §1).

NOT part of the frozen driver contract (bench.py is the measured artifact);
this harness exists to attribute time inside the headline queries and to
capture `.explain("formatted")` for plans/r06/.  Usage:

    python bench_extra.py [phase ...]

Phases: q1 q2 q3 q7 q7parts plans.  Default: all.
Results print as one JSON line per phase; explains land in plans/r06/.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_ENTITIES = int(os.environ.get("SPARK_GRAFT_BENCH_ENTITIES", "6000"))
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "plans", "r06")


def _spark():
    from name_matching_spark.session import get_spark
    return get_spark("nm-bench-extra", master=f"local[{CPUS}]",
                     shuffle_partitions=max(2 * CPUS, 32))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, thunk, sink="noop", trials=2):
    """Best-of-trials wall seconds; each trial rebuilds the plan."""
    best = None
    for _ in range(trials):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        res = thunk()
        if sink == "noop" and res is not None:
            noop(res)
        w = time.time() - t0
        best = w if best is None or w < best else best
        spark.sparkContext.setJobDescription(None)
    return round(best, 3)


def explain_text(df) -> str:
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def save_plan(df, fname):
    os.makedirs(PLAN_DIR, exist_ok=True)
    with open(os.path.join(PLAN_DIR, fname), "w") as f:
        f.write(explain_text(df))


def plan_stats(df):
    txt = explain_text(df)
    return {"exchanges": txt.count("Exchange"),
            "python": txt.count("EvalPython") + txt.count("MapInPandas")
            + txt.count("MapInArrow"),
            "smj": txt.count("SortMergeJoin"),
            "bhj": txt.count("BroadcastHashJoin")}


# ---------------------------------------------------------------------------


def phase_q1(spark, out):
    from pyspark.sql import functions as F
    from name_matching_spark.pipeline import MatchConfig, match_pages
    from name_matching_spark.sources.pages import spark_pages_df

    pages = spark_pages_df(spark, entities=BENCH_ENTITIES, variants=2)
    pages = pages.persist()
    pages.count()
    a = pages.filter(F.col("variant_id") == 1)
    b = pages.filter(F.col("variant_id") == 0)
    cfg = MatchConfig(threshold=50.0, df_cap_frac=0.25)
    out["q1_linkage_pages"] = timed(
        spark, "q1", lambda: match_pages(spark, a, b, config=cfg).count(),
        sink="none")
    pages.unpersist()


def phase_q2(spark, out):
    import __spark_entry__ as entry
    qs = entry.queries()
    df = qs["cosine_topk"](spark, SF_DIR)
    out["q2_plan"] = plan_stats(df)
    out["q2_cosine_topk"] = timed(
        spark, "q2", lambda: qs["cosine_topk"](spark, SF_DIR))


def phase_q3(spark, out):
    import __spark_entry__ as entry
    from name_matching_spark.operators.dedup import minhash_lsh_dedup

    def _q3():
        docs = entry._docs_aug(spark, SF_DIR)
        return minhash_lsh_dedup(docs, "doc_id", "text", num_hashes=16,
                                 bands=2, min_jaccard=0.5)
    out["q3_lsh_dedup"] = timed(spark, "q3", _q3)


def phase_q7(spark, out):
    out["q7_prefix_blocking_20k"] = timed(
        spark, "q7", lambda: _q7_run(spark), sink="none", trials=2)


def _q7_names(spark, E=20000):
    from pyspark.sql import functions as F
    from name_matching_spark.functions.extract import extract_name
    from name_matching_spark.functions.normalize import preprocess_udf
    from name_matching_spark.sources.pages import spark_pages_df
    pgs = spark_pages_df(spark, entities=E, variants=2)
    pp = preprocess_udf()
    return pgs.select(
        "url", "variant_id",
        pp(extract_name(F.col("html"), F.col("text"))).alias("name"))


def _q7_block(spark, names):
    from pyspark.sql import functions as F
    from name_matching_spark.operators.blocking import prefix_filtered_top_n
    from name_matching_spark.operators.tfidf import (
        doc_count_table, explode_char_ngrams, idf_table, master_weights,
        query_weights, with_group)
    m = with_group(names.filter(F.col("variant_id") == 0)
                   .select(F.col("url").alias("id"), "name"), None)
    q = with_group(names.filter(F.col("variant_id") == 1)
                   .select(F.col("url").alias("id"), "name"), None)
    m_tf = explode_char_ngrams(m, "id", "name")
    q_tf = explode_char_ngrams(q, "id", "name")
    idf = idf_table(m_tf, doc_count_table(m, "id"))
    return prefix_filtered_top_n(
        query_weights(q_tf, idf), master_weights(m_tf, idf), idf,
        top_n=50, prefix_size=6, df_cap_frac=0.2)


def _q7_run(spark):
    names = _q7_names(spark).persist()
    names.count()
    n = _q7_block(spark, names).count()
    names.unpersist()
    return n


def phase_q7parts(spark, out):
    # part A: generation + extract + preprocess + persist/count
    names = _q7_names(spark)
    out["q7_gen_extract_prep"] = timed(
        spark, "q7:gen", lambda: names, sink="noop")
    # part B: blocking only, names persisted (what the blocker itself costs)
    names = _q7_names(spark).persist()
    names.count()
    blocked = _q7_block(spark, names)
    out["q7_block_plan"] = plan_stats(blocked)
    out["q7_block_only"] = timed(
        spark, "q7:block", lambda: _q7_block(spark, names).count(),
        sink="none")
    names.unpersist()


def phase_plans(spark, out):
    import __spark_entry__ as entry
    qs = entry.queries()
    save_plan(qs["cosine_topk"](spark, SF_DIR), "q2_cosine_topk.txt")
    names = _q7_names(spark).persist()
    names.count()
    save_plan(_q7_block(spark, names), "q7_prefix_blocking.txt")
    names.unpersist()
    out["plans"] = "saved"


PHASES = {"q1": phase_q1, "q2": phase_q2, "q3": phase_q3, "q7": phase_q7,
          "q7parts": phase_q7parts, "plans": phase_plans}


def main():
    which = sys.argv[1:] or ["q2", "q3", "q7parts", "q1", "q7"]
    spark = _spark()
    out = {"sf_dir": SF_DIR, "cpus": CPUS,
           "load_before": [round(x, 2) for x in os.getloadavg()]}
    try:
        for ph in which:
            PHASES[ph](spark, out)
    finally:
        out["load_after"] = [round(x, 2) for x in os.getloadavg()]
        print(json.dumps(out))
        spark.stop()


if __name__ == "__main__":
    main()
