"""Preprocess parity on the full reference dictionaries.

Round-2 coverage for the VERDICT's #1 gap: the engine now ships the full
MIT-licensed dictionary tables (legal_names.csv 455 rows, common_words.csv
776 rows, transliterations.py 316 entries — see nm_core/dictionaries.py).

Three layers:
 1. the reference's own golden preprocess flag matrix
    (reference name_matching/test/test_name_matcher.py:212-290);
 2. word-set semantics mirroring test_make_no_scoring_words (:687-706);
 3. dictionary-row-driven expectations (names built from full-CSV rows that
    the round-1 compact tables did not contain), hand-derived by applying
    the reference algorithm (name_matcher.py:350-458) to the CSV rows;
 4. equivalence of the precompiled fast paths (CompiledRules) with the
    generic sequential replace_rules loop.
"""

import random

import pytest

from name_matching_spark.nm_core.data import (
    COMMON_WORDS,
    LEGAL_FORMS,
    TRANSLITERATION_MAP,
    common_words,
    legal_forms,
)
from name_matching_spark.nm_core.preprocess import (
    CompiledRules,
    PreprocessConfig,
    common_word_set,
    expand_legal_rules,
    legal_word_set,
    preprocess_name,
    replace_rules,
)


def test_full_dictionary_sizes():
    assert len(LEGAL_FORMS) == 455
    assert len(COMMON_WORDS) == 776
    assert len(TRANSLITERATION_MAP) == 316


def test_dictionary_spot_rows():
    # rows present only in the full tables, not round-1's compact ones
    assert ("plc ltd.", "societe anonyme publique limitee ") in LEGAL_FORMS
    assert ("3.a.t.", "zakrytae aktsyyanernae tavarystva") in LEGAL_FORMS
    assert ("szolgaltato", "#srv#") in COMMON_WORDS
    assert ("kompaniya", "#coo#") in COMMON_WORDS
    # duplicate rows are preserved verbatim (rule order depends on them)
    assert LEGAL_FORMS.count(("a.g.", "aktiengesellschaft")) >= 2


# reference test_name_matcher.py:212-282 golden matrix (same three names);
# make_abbreviations is on by default in the reference and none of these
# words are in common_words.csv, so expectations carry over unchanged.
@pytest.mark.parametrize(
    "lower_case, non_word, ascii_, r1, r2, r3",
    [
        (False, False, False, "Schumm PLC", "Towne, Johnston and Murray", "Ösinski-Schinner"),
        (True, False, False, "schumm plc", "towne, johnston and murray", "ösinski-schinner"),
        (False, True, False, "Schumm PLC", "Towne Johnston and Murray", "Ösinski-Schinner"),
        (False, False, True, "Schumm PLC", "Towne, Johnston and Murray", "Osinski-Schinner"),
        (False, True, True, "Schumm PLC", "Towne Johnston and Murray", "Osinski-Schinner"),
        (True, False, True, "schumm plc", "towne, johnston and murray", "osinski-schinner"),
        (True, True, False, "schumm plc", "towne johnston and murray", "ösinski-schinner"),
        (True, True, True, "schumm plc", "towne johnston and murray", "osinski-schinner"),
    ],
)
def test_preprocess_flag_matrix_reference_golden(
    lower_case, non_word, ascii_, r1, r2, r3
):
    cfg = PreprocessConfig(
        lowercase=lower_case,
        non_word_characters=non_word,
        remove_ascii=ascii_,
    )
    assert preprocess_name("Schumm PLC", cfg) == r1
    assert preprocess_name("Towne, Johnston and Murray", cfg) == r2
    assert preprocess_name("Ösinski-Schinner", cfg) == r3


def test_legal_word_set_reference_golden():
    # mirrors test_make_no_scoring_words legal cases (:687-697): the legal
    # no-scoring set is the raw abbreviation column, which contains both
    # dotted and undotted plc rows
    ws = legal_word_set()
    assert "plc" in ws and "plc." in ws
    assert "bedrijf" not in ws


def test_common_word_set_cutoff():
    names = ["acme bank", "beta bank", "gamma bank", "delta works"]
    ws = common_word_set(names, cut_off=0.5)
    assert "bank" in ws and "acme" not in ws


# hand-derived by applying the reference expansion/replacement algorithm
# (name_matcher.py:350-458) to full-CSV rows; all rows exercised here are
# absent from round-1's compact tables
@pytest.mark.parametrize(
    "name, expected",
    [
        # fallback path (len(abbr) < len(lgl), _combine_legal_words fails)
        ("Acme Societe Anonyme Publique Limitee", "acme plc ltd"),
        ("Acme Public Limited Company", "acme plc"),
        # fallback path (len(abbr) > len(lgl)): k.g. <- kommanditgesellschaft
        ("Widget Kommanditgesellschaft", "widget k g"),
        # combination path: v.z.w. <- vereniging zonder winstoogmerk (prefix)
        ("Vereniging Zonder Winstoogmerk Acme", "v z w acme"),
        ("Acme Kabushiki Kaisha", "acme k k"),
        ("Acme Aktsyyanernaye Atkrytae Tavarystva", "acme a a t"),
        # reference quirk kept: accented dictionary rows (ë, ü) can never
        # fire because the name is asciified before replacement while the
        # rule text keeps its accents
        ("Acme Shoqëri Aksionare", "acme shoqeri aksionare"),
        ("Acme Gesellschaft Bürgerlichen Rechts",
         "acme gesellschaft burgerlichen rechts"),
    ],
)
def test_legal_abbreviation_full_csv(name, expected):
    cfg = PreprocessConfig(preprocess_legal=True)
    assert preprocess_name(name, cfg) == expected


@pytest.mark.parametrize(
    "name, expected",
    [
        ("Acme Holding Services", "acme #hld# #srv#"),
        ("Global Management Consulting Szolgaltato", "global #mgt# #clt# #srv#"),
        ("Acme Beheer International", "acme #hld# #int#"),
        ("Kompaniya Auto Trans", "#coo# #atb# #trp#"),
    ],
)
def test_common_abbreviation_full_csv(name, expected):
    assert preprocess_name(name, PreprocessConfig()) == expected


def test_fast_paths_preconditions():
    # the single-pass common-word path is only valid under these three
    # properties of the shipped table; assert them so a future data change
    # that breaks them fails loudly (CompiledRules then falls back anyway)
    words = [w for w, _ in common_words()]
    shorts = [s for _, s in common_words()]
    assert len(words) == len(set(words))  # no duplicate rule words
    assert all(w.isidentifier() or w.isalnum() or "_" in w for w in words)
    inner = {s.strip("#") for s in shorts}
    assert not (set(words) & inner)  # no rule word inside a short form
    cr = CompiledRules(expand_legal_rules(), common_words())
    assert cr.common_word_map is not None  # fast path actually engaged


def test_fast_paths_equivalent_to_sequential():
    legal_rules = expand_legal_rules()
    cw = common_words()
    cr = CompiledRules(legal_rules, cw)
    pool = (
        [w for w, _ in cw[:150]]
        + [ln for _, ln in legal_rules[::19]]
        + ["acme", "bank", "x1", "inter-group", "b", "v", "co", "de"]
    )
    rng = random.Random(7)
    for _ in range(800):
        n = " ".join(rng.choices(pool, k=rng.randint(1, 6)))
        assert cr.apply_legal(n) == replace_rules(n, legal_rules, begin_end=True)
        assert cr.apply_common(n) == replace_rules(
            n, [(sf, w) for w, sf in cw], begin_end=False
        )


def test_external_csv_override(tmp_path):
    p = tmp_path / "legal.csv"
    p.write_text("abbreviation,full_name\nxx.,xample xorporation\n")
    assert legal_forms(p) == [("xx.", "xample xorporation")]
