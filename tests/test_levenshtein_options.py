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
