"""Full-option Levenshtein surface + expanded language-ID coverage.

Alignment/mode/cost golden values are the reference's own published
docstring examples (distances/_levenshtein.py:200-222).
"""

import pytest

from name_matching_spark.nm_core.metrics import (
    levenshtein_alignment,
    levenshtein_dist_abs,
    sim_levenshtein,
)


@pytest.mark.parametrize(
    "src, tar, mode, expected",
    [
        ("cat", "hat", "lev", (1.0, "cat", "hat")),
        ("Niall", "Neil", "lev", (3.0, "N-iall", "Nei-l-")),
        ("aluminum", "Catalan", "lev", (7.0, "-aluminum", "Catalan--")),
        ("ATCG", "TAGC", "lev", (3.0, "ATCG-", "-TAGC")),
        ("ATCG", "TAGC", "osa", (2.0, "ATCG", "TAGC")),
        ("ACTG", "TAGC", "osa", (4.0, "ACT-G-", "--TAGC")),
    ],
)
def test_alignment_reference_examples(src, tar, mode, expected):
    assert levenshtein_alignment(src, tar, mode=mode) == expected
    assert levenshtein_dist_abs(src, tar, mode=mode) == expected[0]


def test_osa_counts_transposition_once():
    assert levenshtein_dist_abs("abcd", "abdc", mode="osa") == 1
    assert levenshtein_dist_abs("abcd", "abdc", mode="lev") == 2


def test_cost_tuple():
    # substitution costing 2 forces del+ins (also 2) -- same total
    assert levenshtein_dist_abs("cat", "hat", cost=(1, 1, 2, 1)) == 2
    # cheap inserts: 'ab' -> 'aXb' costs 0.5
    assert levenshtein_dist_abs("ab", "aXb", cost=(0.5, 1, 1, 1)) == 0.5
    assert levenshtein_dist_abs("", "xyz", cost=(0.25, 1, 1, 1)) == 0.75


def test_dist_abs_default_path_consistent():
    for a, b in [("cat", "hat"), ("Niall", "Neil"), ("", ""), ("a", "")]:
        denom = max(len(a), len(b)) or 1
        assert sim_levenshtein(a, b) == pytest.approx(
            1 - levenshtein_dist_abs(a, b) / denom)


def test_sim_levenshtein_kwargs_surface():
    """sim_levenshtein threads mode/cost through to the option-surface
    dist and uses the reference's normalizer
    max(len(src)*del, len(tar)*ins) (distances/_levenshtein.py:325-383),
    which reduces to max(len) at unit costs."""
    # golden values derived from the already-validated dist_abs
    for a, b, kw in [
        ("cat", "hat", {"cost": (1, 1, 2, 1)}),
        ("ATCG", "TAGC", {"mode": "osa"}),
        ("ab", "aXb", {"cost": (0.5, 1, 1, 1)}),
        ("Niall", "Neil", {"mode": "osa", "cost": (1, 1, 2, 2)}),
    ]:
        cost = kw.get("cost", (1, 1, 1, 1))
        mode = kw.get("mode", "lev")
        denom = max(len(a) * cost[1], len(b) * cost[0])
        assert sim_levenshtein(a, b, **kw) == pytest.approx(
            1 - levenshtein_dist_abs(a, b, mode=mode, cost=cost) / denom)
    # default kwargs stay bit-identical to the costless fast path
    assert sim_levenshtein("Niall", "Neil", mode="lev",
                           cost=(1, 1, 1, 1)) == sim_levenshtein(
        "Niall", "Neil")
    assert sim_levenshtein("", "", cost=(2, 2, 2, 2)) == 1.0


def test_metric_registry_kwargs_variants():
    """Reference parity: make_distance_metrics accepts bool|dict per
    metric (distance_metrics.py:258-430).  The repo registry takes the
    mapping form, threads kwargs into closures, keys pair-cache
    namespaces per variant, and rejects unknown kwargs eagerly."""
    import numpy as np

    from name_matching_spark.nm_core import metrics as M
    from name_matching_spark.nm_core import metrics_batch as MB

    spec = {"overlap": True, "levenshtein": {"cost": (1, 1, 2, 2)},
            "editex": True, "discounted_levenshtein": False}
    norm = M.normalize_metric_spec(spec)
    assert norm == (("overlap", ()),
                    ("levenshtein", (("cost", (1, 1, 2, 2)),)),
                    ("editex", ()))
    assert M.normalize_metric_spec(norm) == norm      # idempotent

    # registry order: group first-insertion, if-chain order within
    labels = MB.flat_metric_columns(spec)
    assert labels == ["levenshtein[cost=(1, 1, 2, 2)]", "overlap",
                      "editex"]
    fns = M.flat_metric_fns(spec)
    assert fns[0]("cat", "hat") == pytest.approx(
        M.sim_levenshtein("cat", "hat", cost=(1, 1, 2, 2)))

    # batch path: kwargs variant routes to the scalar fn with kwargs
    # bound; default columns still hit the batch kernels; cache keyed
    # per variant tuple
    MB._PAIR_CACHE.clear()
    try:
        pairs = [("cat", "hat"), ("Niall", "Neil"), ("acme bv", "acme")]
        a = [p[0] for p in pairs]
        b = [p[1] for p in pairs]
        got = MB.score_batch(a, b, spec)
        want = np.array([[M.sim_levenshtein(x, y, cost=(1, 1, 2, 2)),
                          M.sim_overlap(x, y), M.sim_editex(x, y)]
                         for x, y in pairs])
        np.testing.assert_array_equal(got, want)
        default_cols = MB.flat_metric_columns({"levenshtein": True,
                                               "overlap": True,
                                               "editex": True})
        assert tuple(default_cols) != tuple(labels)
        got_default = MB.score_batch(a, b, ["levenshtein", "overlap",
                                            "editex"])
        assert got_default[0][0] == M.sim_levenshtein("cat", "hat")
        assert got[0][0] != got_default[0][0]      # variants truly differ
        assert tuple(labels) in MB._PAIR_CACHE
        assert tuple(default_cols) in MB._PAIR_CACHE
    finally:
        MB._PAIR_CACHE.clear()

    with pytest.raises(TypeError, match="does not accept kwargs"):
        M.make_metric_registry({"overlap": {"no_such_kw": 1}})
    with pytest.raises(TypeError, match="Unknown distance metrics"):
        M.make_metric_registry({"no_such_metric": True})


def test_kwargs_metrics_through_udf_path(spark):
    """The full Arrow UDF path accepts the kwargs mapping: per-metric
    scores from score_candidates(keep_scores=True) equal the scalar
    functions with the kwargs bound."""
    from name_matching_spark.nm_core import metrics as M
    from name_matching_spark.operators.scoring import score_candidates

    spec = {"levenshtein": {"cost": (1, 1, 2, 2)}, "overlap": True,
            "editex": True}
    pairs = [("acme corp", "acme corporation"),
             ("cat", "hat"), ("niall", "neil")]
    df = spark.createDataFrame(pairs, "query_name string, cand_name string")
    got = {(r["query_name"], r["cand_name"]): r["scores"]
           for r in score_candidates(df, metrics=spec,
                                     keep_scores=True).collect()}
    for a, b in pairs:
        want = [M.sim_levenshtein(a, b, cost=(1, 1, 2, 2)),
                M.sim_overlap(a, b), M.sim_editex(a, b)]
        assert got[(a, b)] == pytest.approx(want, abs=1e-12)


def test_lang_id_ten_languages(spark):
    from name_matching_spark.operators.textstats import lang_id

    rows = [
        (0, "the report was written with care and this is known from it"),
        (1, "het rapport werd geschreven met zorg voor deze mensen ook"),
        (2, "der bericht wurde mit sorgfalt geschrieben und nicht durch zufall"),
        (3, "le rapport est dans la salle avec les documents pour cette fois"),
        (4, "el informe con los datos para las personas pero sobre todo muy"),
        (5, "il rapporto che sono anche per questo come nella storia alla fine"),
        (6, "nao sao dos seus mas com voce tambem isso muito mais"),
        (7, "och det som att inte till den ett om kan efter under"),
        (8, "nie jest przez oraz tym jak dla tego jego tylko"),
        (9, "bir ve bu icin ile olarak daha cok ama gibi sonra"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r["lang_pred"]
           for r in lang_id(df, "doc_id", "text").collect()}
    assert got == {0: "en", 1: "nl", 2: "de", 3: "fr", 4: "es",
                   5: "it", 6: "pt", 7: "sv", 8: "pl", 9: "tr"}
