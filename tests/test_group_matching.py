"""Group-blocked matching: one shuffled job must equal per-group refits."""

import pytest

from name_matching_spark.nm_core.oracle import run_nm_oracle
from name_matching_spark.pipeline import MatchConfig, match_names
from name_matching_spark.sources.pages import (
    adjusted_names_corpus,
    names_corpus,
)

N = 48


@pytest.fixture(scope="module")
def grouped(spark):
    names = names_corpus(N)
    adj = adjusted_names_corpus(N)
    df_b = spark.createDataFrame(
        [(r["id"], r["company_name"], r["country"]) for r in names],
        "id long, name string, country string")
    df_a = spark.createDataFrame(
        [(r["id"], r["company_name"], r["country"]) for r in adj],
        "id long, name string, country string")
    res = match_names(spark, df_a, df_b, "id", "name", "id", "name",
                      group_col_a="country", group_col_b="country",
                      config=MatchConfig(threshold=0.0))
    return names, adj, {int(r["a_id"]): (int(r["b_id"]), float(r["score"]))
                        for r in res.collect()}


def test_group_matching_equals_per_group_oracle(grouped):
    names, adj, spark_matches = grouped
    # oracle: independent run per country (the reference's per-group refit)
    expected = {}
    for country in sorted({r["country"] for r in names}):
        b_rows = [r for r in names if r["country"] == country]
        a_rows = [r for r in adj if r["country"] == country]
        if not a_rows or not b_rows:
            continue
        res = run_nm_oracle([r["company_name"] for r in a_rows],
                            [r["company_name"] for r in b_rows],
                            threshold=0.0)
        for local_a, (local_b, score) in res.items():
            expected[a_rows[local_a]["id"]] = (b_rows[local_b]["id"], score)
    assert set(spark_matches) == set(expected)
    for a_id, (b_id, score) in expected.items():
        got_b, got_s = spark_matches[a_id]
        assert got_b == b_id, f"a{a_id}: {got_b} != {b_id}"
        assert got_s == pytest.approx(score, abs=1e-9)


def test_no_cross_group_matches(grouped):
    names, adj, spark_matches = grouped
    country_a = {r["id"]: r["country"] for r in adj}
    country_b = {r["id"]: r["country"] for r in names}
    for a_id, (b_id, _) in spark_matches.items():
        assert country_a[a_id] == country_b[b_id]


def test_grouped_skew_routes_per_group_and_stays_correct(
        spark, monkeypatch):
    """One huge block + many tiny blocks: the auto probe must route the
    over-threshold block through the prefix blocker and the tiny blocks
    through the exact join IN ONE RUN (r4 verdict: the old global probe
    sent thousands of tiny blocks through prefix overhead), and the
    union's match decisions must equal the exact-blocker run."""
    import name_matching_spark.operators.blocking as blocking
    import name_matching_spark.pipeline as pl

    names = names_corpus(N)
    adj = adjusted_names_corpus(N)
    # skewed grouping: 3/4 of rows in one hot block, the rest in per-row
    # singleton blocks (wildly uneven block sizes)
    def blk(r):
        return "hot" if r["id"] % 4 != 0 else f"tiny{r['id']}"
    df_b = spark.createDataFrame(
        [(r["id"], r["company_name"], blk(r)) for r in names],
        "id long, name string, blk string")
    df_a = spark.createDataFrame(
        [(r["id"], r["company_name"], blk(r)) for r in adj],
        "id long, name string, blk string")

    calls = {"prefix": 0, "exact": 0}
    real_prefix = blocking.prefix_filtered_top_n
    real_exact = pl.cosine_top_n

    def spy_prefix(*a, **k):
        calls["prefix"] += 1
        return real_prefix(*a, **k)

    def spy_exact(*a, **k):
        calls["exact"] += 1
        return real_exact(*a, **k)

    monkeypatch.setattr(blocking, "prefix_filtered_top_n", spy_prefix)
    monkeypatch.setattr(pl, "cosine_top_n", spy_exact)

    # hot block (~36 masters) is above this probe threshold; prefix 12
    # keeps gram overlap decision-identical on the singleton blocks at a
    # real threshold (at threshold 0 even a one-shared-gram garbage name
    # "matches" on the exhaustive path -- not a decision any run keeps)
    cfg_auto = MatchConfig(threshold=50.0, auto_prefix_threshold=20,
                           auto_prefix_size=12)
    got = {
        int(r["a_id"]): int(r["b_id"])
        for r in match_names(spark, df_a, df_b, "id", "name", "id", "name",
                             group_col_a="blk", group_col_b="blk",
                             config=cfg_auto).collect()
    }
    # BOTH paths active in one run: prefix for the hot block, exact join
    # for the singleton blocks
    assert calls == {"prefix": 1, "exact": 1}, calls

    # control: threshold far above the hot block size -> exact path only
    cfg_exact = MatchConfig(threshold=50.0, auto_prefix_threshold=10_000)
    want = {
        int(r["a_id"]): int(r["b_id"])
        for r in match_names(spark, df_a, df_b, "id", "name", "id", "name",
                             group_col_a="blk", group_col_b="blk",
                             config=cfg_exact).collect()
    }
    assert calls == {"prefix": 1, "exact": 2}, calls
    assert got == want
    # decisions from BOTH routed paths made it into the output
    hot_ids = {r["id"] for r in adj if r["id"] % 4 != 0}
    assert got.keys() & hot_ids
    assert got.keys() - hot_ids


def test_grouped_skew_routing_through_fitted_master(spark):
    """fit_master on a skewed grouped corpus resolves the routed plan at
    fit time (big_groups persisted; prefix artifacts restricted to the
    big groups) and match_names(fitted=...) reproduces the direct run."""
    from name_matching_spark.pipeline import fit_master

    names = names_corpus(N)
    adj = adjusted_names_corpus(N)

    def blk(r):
        return "hot" if r["id"] % 4 != 0 else f"tiny{r['id']}"
    df_b = spark.createDataFrame(
        [(r["id"], r["company_name"], blk(r)) for r in names],
        "id long, name string, blk string")
    df_a = spark.createDataFrame(
        [(r["id"], r["company_name"], blk(r)) for r in adj],
        "id long, name string, blk string")
    cfg = MatchConfig(threshold=50.0, auto_prefix_threshold=20,
                      auto_prefix_size=12)
    direct = {
        (int(r["a_id"]), int(r["b_id"]), round(float(r["score"]), 6))
        for r in match_names(spark, df_a, df_b, "id", "name", "id", "name",
                             group_col_a="blk", group_col_b="blk",
                             config=cfg).collect()
    }
    fitted = fit_master(df_b, "id", "name", group_col_b="blk", config=cfg)
    assert fitted.big_groups is not None
    assert [r["__group"] for r in fitted.big_groups.collect()] == ["hot"]
    # prefix artifacts cover the big groups only
    assert set(r["__group"] for r in
               fitted.m_pref.select("__group").distinct().collect()) \
        == {"hot"}
    via_fit = {
        (int(r["a_id"]), int(r["b_id"]), round(float(r["score"]), 6))
        for r in match_names(spark, df_a, None, "id", "name",
                             group_col_a="blk", config=cfg,
                             fitted=fitted).collect()
    }
    assert via_fit == direct
    fitted.unpersist()
