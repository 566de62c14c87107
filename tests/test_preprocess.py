"""Preprocessing kernel tests (flag matrix mirrors the reference's
test_name_matcher.py:212-290 expectations)."""

import pytest

from name_matching_spark.nm_core.preprocess import (
    PreprocessConfig,
    clean_non_word,
    common_word_set,
    expand_legal_rules,
    light_preprocess_name,
    preprocess_name,
    replace_rules,
    strip_words,
    unicode_to_ascii,
)


@pytest.mark.parametrize(
    "lower,nonword,ascii_,inp,expected",
    [
        (False, False, False, "Towne, Johnston and Murray",
         "Towne, Johnston and Murray"),
        (True, False, False, "Towne, Johnston and Murray",
         "towne, johnston and murray"),
        (False, True, False, "Towne, Johnston and Murray",
         "Towne Johnston and Murray"),
        (False, False, True, "Ösinski-Schinner", "Osinski-Schinner"),
        (True, True, True, "Towne, Johnston and Murray",
         "towne johnston and murray"),
        (True, True, True, "Ösinski-Schinner", "osinski-schinner"),
        (False, False, False, "Schumm PLC", "Schumm PLC"),
        (True, False, False, "Schumm PLC", "schumm plc"),
    ],
)
def test_preprocess_flags(lower, nonword, ascii_, inp, expected):
    cfg = PreprocessConfig(lowercase=lower, non_word_characters=nonword,
                           remove_ascii=ascii_, make_abbreviations=False)
    assert preprocess_name(inp, cfg) == expected


def test_preprocess_idempotent():
    cfg = PreprocessConfig()
    names = ["Ösinski & Schinner B.V.", "ACME  Corp.", "foo-bar #1",
             "Ångström Ltd"]
    for n in names:
        once = preprocess_name(n, cfg)
        assert preprocess_name(once, cfg) == once


def test_clean_non_word_keeps_amp_hash_dash():
    assert clean_non_word("a&b #c - d, e. (f)") == "a&b #c - d e f"


def test_unicode_to_ascii():
    assert unicode_to_ascii("Ångström") == "Angstrom"
    # the reference transliteration map has lowercase keys only
    # (data/transliterations.py), so uppercase Æ is dropped by the ASCII
    # encode — byte-parity with the reference, which runs ascii before lower
    assert unicode_to_ascii("Ærø Søby") == "ro Soby"
    assert unicode_to_ascii("ærø søby") == "aero soby"
    assert unicode_to_ascii("straße") == "strasse"


def test_light_preprocess():
    assert light_preprocess_name(" Towne, Johnston & Murray ") == \
        "towne johnston  murray"
    assert light_preprocess_name("Ösinski") == "osinski"


def test_legal_rule_expansion_combinations():
    rules = expand_legal_rules([("b.v.", "besloten vennootschap")])
    longs = [l for _, l in rules]
    # 2^2 mixtures + the concatenated abbreviation
    assert "besloten vennootschap" in longs
    assert "b v" in longs
    assert "besloten v" in longs
    assert "b vennootschap" in longs
    assert "bv" in longs
    assert all(a == "b.v." for a, _ in rules)


def test_replace_rules_begin_end_only():
    rules = expand_legal_rules([("b.v.", "besloten vennootschap")])
    assert replace_rules("acme besloten vennootschap", rules) == "acme b.v."
    assert replace_rules("besloten vennootschap acme", rules) == "b.v. acme"
    # interior occurrences untouched in begin_end mode
    assert replace_rules("x besloten vennootschap x", rules) == \
        "x besloten vennootschap x"


def test_replace_rules_delete():
    rules = expand_legal_rules([("b.v.", "besloten vennootschap")])
    assert replace_rules("acme besloten vennootschap", rules,
                         delete=True).strip() == "acme"


def test_common_word_replacement_in_pipeline():
    cfg = PreprocessConfig()  # make_abbreviations=True by default
    out = preprocess_name("ACME Holding Services", cfg)
    assert out == "acme #hld# #srv#"


def test_common_word_set_and_strip():
    names = ["acme bank", "foo bank", "bar bank", "baz trading"]
    ws = common_word_set(names, cut_off=0.5)
    assert ws == {"bank"}
    assert strip_words("acme bank", ws) == "acme"
