"""Golden-value tests for the similarity-metric kernel.

Expected values ported from the reference's public test suite
(/root/reference/name_matching/test/test_distance_metrics.py) -- hand-computed
similarities of "De Nederlandsche Bank" against perturbations.
"""

import pytest

from name_matching_spark.nm_core import metrics as M

A = "De Nederlandsche Bank"

GOLDEN = {
    "indel": [
        (A, A, 1), (A, "Nederlandsche Bank", 36 / 39),
        (A, "Bank de Nederlandsche", 55 / 77), (A, "De Nederlandse Bank", 0.95),
        (A, "De Nederlancsh Bank", 0.9), (A, "De Bank", 0.5),
        (A, "Bank", 0.32), (A, "De Duitse Bank", 4 / 7),
        (A, "Federal Reserve", 7 / 18),
    ],
    "discounted_levenshtein": [
        (A, A, 1), (A, "Nederlandsche Bank", 10360 / 13259),
        (A, "Bank de Nederlandsche", 14171 / 31229),
        (A, "De Nederlandse Bank", 12668 / 13693),
        (A, "De Nederlancsh Bank", 14285 / 16126),
        (A, "De Bank", 73895 / 197251), (A, "Bank", 0.18443356121294618),
        (A, "De Duitse Bank", 0.4850080059940999),
        (A, "Federal Reserve", 0.3134817407970336),
    ],
    "tichy": [
        (A, A, 1), (A, "Nederlandsche Bank", 17 / 18),
        (A, "Bank de Nederlandsche", 17 / 21), (A, "De Nederlandse Bank", 17 / 19),
        (A, "De Nederlancsh Bank", 14 / 19), (A, "De Bank", 5 / 7),
        (A, "Bank", 0.75), (A, "De Duitse Bank", 0.50),
        (A, "Federal Reserve", 4 / 15),
    ],
    "cormodel_z": [
        (A, A, 1), (A, "Nederlandsche Bank", 19 / 21),
        (A, "Bank de Nederlandsche", 6 / 7), (A, "De Nederlandse Bank", 6 / 7),
        (A, "De Nederlancsh Bank", 5 / 7), (A, "De Bank", 3 / 7),
        (A, "Bank", 2 / 7), (A, "De Duitse Bank", 3 / 7),
        (A, "Federal Reserve", 5 / 21),
    ],
    "iterative_sub_string": [
        (A, A, 1), (A, "Nederlandsche Bank", 25 / 26),
        (A, "Bank de Nederlandsche", 0.9456378640464952),
        (A, "De Nederlandse Bank", 197 / 200),
        (A, "De Nederlancsh Bank", 0.9147134187457855),
        (A, "De Bank", 1643 / 2210), (A, "Bank", 0.66),
        (A, "De Duitse Bank", 0.7153211009174312),
        (A, "Federal Reserve", 0.3081299056671707),
    ],
    "baulieu_xiii": [
        (A, A, 1), (A, "Nederlandsche Bank", 18 / 23),
        (A, "Bank de Nederlandsche", 17 / 27), (A, "De Nederlandse Bank", 19 / 23),
        (A, "De Nederlancsh Bank", 16 / 26), (A, "De Bank", 8 / 22),
        (A, "Bank", 4 / 23), (A, "De Duitse Bank", 9 / 28),
        (A, "Federal Reserve", 3 / 35),
    ],
    "clement": [
        (A, A, 1), (A, "Nederlandsche Bank", 0.8232342408134744),
        (A, "Bank de Nederlandsche", 0.7788978053198099),
        (A, "De Nederlandse Bank", 0.8674165216369765),
        (A, "De Nederlancsh Bank", 0.734759771488919),
        (A, "De Bank", 0.38144806847096924), (A, "Bank", 0.20468230928444348),
        (A, "De Duitse Bank", 0.42541053393936973),
        (A, "Federal Reserve", 0.16003090928720642),
    ],
    "dice_asymmetrici": [
        (A, A, 1), (A, "Nederlandsche Bank", 9 / 11),
        (A, "Bank de Nederlandsche", 17 / 22), (A, "De Nederlandse Bank", 19 / 22),
        (A, "De Nederlancsh Bank", 8 / 11), (A, "De Bank", 4 / 11),
        (A, "Bank", 2 / 11), (A, "De Duitse Bank", 9 / 22),
        (A, "Federal Reserve", 3 / 22),
    ],
    "kuhns_iii": [
        (A, A, 3067 / 3100), (A, "Nederlandsche Bank", 0.8271005106727322),
        (A, "Bank de Nederlandsche", 0.7115907789232533),
        (A, "De Nederlandse Bank", 0.8594338161878166),
        (A, "De Nederlancsh Bank", 0.7014070603349739),
        (A, "De Bank", 0.5170872111993288), (A, "Bank", 0.376527052407862),
        (A, "De Duitse Bank", 0.48246333174338174),
        (A, "Federal Reserve", 0.30535291331122694),
    ],
    "overlap": [
        (A, A, 1), (A, "Nederlandsche Bank", 18 / 19),
        (A, "Bank de Nederlandsche", 17 / 22), (A, "De Nederlandse Bank", 0.95),
        (A, "De Nederlancsh Bank", 0.8), (A, "De Bank", 1.0),
        (A, "Bank", 0.8), (A, "De Duitse Bank", 0.6),
        (A, "Federal Reserve", 3 / 16),
    ],
    "pearson_ii": [
        (A, A, 1), (A, "Nederlandsche Bank", 0.9326379507404536),
        (A, "Bank de Nederlandsche", 0.860116027428689),
        (A, "De Nederlandse Bank", 0.9479333464498336),
        (A, "De Nederlancsh Bank", 0.8530617633487101),
        (A, "De Bank", 0.7254387697419673), (A, "Bank", 0.495978140334987),
        (A, "De Duitse Bank", 0.6158120209632525),
        (A, "Federal Reserve", 0.19529216149425904),
    ],
    "weighted_jaccard": [
        (A, A, 1), (A, "Nederlandsche Bank", 54 / 59),
        (A, "Bank de Nederlandsche", 51 / 61), (A, "De Nederlandse Bank", 57 / 61),
        (A, "De Nederlancsh Bank", 24 / 29), (A, "De Bank", 12 / 19),
        (A, "Bank", 12 / 31), (A, "De Duitse Bank", 27 / 46),
        (A, "Federal Reserve", 9 / 41),
    ],
    "warrens_iv": [
        (A, A, 1), (A, "Nederlandsche Bank", 0.9336347104909842),
        (A, "Bank de Nederlandsche", 0.8693019343986543),
        (A, "De Nederlandse Bank", 0.9488186399633484),
        (A, "De Nederlancsh Bank", 0.8624113475177305),
        (A, "De Bank", 0.6934422509643748), (A, "Bank", 0.4558455621522721),
        (A, "De Duitse Bank", 0.6518716705286544),
        (A, "Federal Reserve", 282 / 1037),
    ],
    "bag": [
        (A, A, 1), (A, "Nederlandsche Bank", 18 / 21),
        (A, "Bank de Nederlandsche", 20 / 22), (A, "De Nederlandse Bank", 19 / 21),
        (A, "De Nederlancsh Bank", 19 / 21), (A, "De Bank", 7 / 21),
        (A, "Bank", 4 / 21), (A, "De Duitse Bank", 10 / 25),
        (A, "Federal Reserve", 10 / 26),
    ],
    "rouge_l": [
        (A, A, 1), (A, "Nederlandsche Bank", 0.8590308370044052),
        (A, "Bank de Nederlandsche", 0.7142857142857144),
        (A, "De Nederlandse Bank", 0.9060895084372709),
        (A, "De Nederlancsh Bank", 0.8584005869405722),
        (A, "De Bank", 65 / 193), (A, "Bank", 65 / 337),
        (A, "De Duitse Bank", 325 / 679),
        (A, "Federal Reserve", 0.33480500367917587),
    ],
    "ratcliff_obershelp": [
        (A, A, 1), (A, "Nederlandsche Bank", 12 / 13),
        (A, "Bank de Nederlandsche", 5 / 7), (A, "De Nederlandse Bank", 0.95),
        (A, "De Nederlancsh Bank", 0.90), (A, "De Bank", 0.5),
        (A, "Bank", 0.32), (A, "De Duitse Bank", 4 / 7),
        (A, "Federal Reserve", 7 / 18),
    ],
    "ncd_bz2": [
        (A, A, 1), (A, "Nederlandsche Bank", 5 / 6),
        (A, "Bank de Nederlandsche", 41 / 49), (A, "De Nederlandse Bank", 7 / 8),
        (A, "De Nederlancsh Bank", 41 / 48), (A, "De Bank", 17 / 24),
        (A, "Bank", 5 / 8), (A, "De Duitse Bank", 35 / 48),
        (A, "Federal Reserve", 5 / 8),
    ],
    "fuzzy_wuzzy_partial_string": [
        (A, A, 1), (A, "Nederlandsche Bank", 1),
        (A, "Bank de Nederlandsche", 5 / 7), (A, "De Nederlandse Bank", 17 / 19),
        (A, "De Nederlancsh Bank", 16 / 19), (A, "De Bank", 6 / 7),
        (A, "Bank", 1), (A, "De Duitse Bank", 0.5),
        (A, "Federal Reserve", 0.4),
    ],
    "fuzzy_wuzzy_token_sort": [
        (A, A, 1), (A, "Nederlandsche Bank", 12 / 13),
        (A, "Bank de Nederlandsche", 6 / 7), (A, "De Nederlandse Bank", 0.95),
        (A, "De Nederlancsh Bank", 0.90), (A, "De Bank", 0.5),
        (A, "Bank", 0.32), (A, "De Duitse Bank", 18 / 35),
        (A, "Federal Reserve", 7 / 18),
    ],
    "fuzzy_wuzzy_token_set": [
        (A, A, 1), (A, "Nederlandsche Bank", 1),
        (A, "Bank de Nederlandsche", 20 / 21), (A, "De Nederlandse Bank", 0.95),
        (A, "De Nederlancsh Bank", 0.90), (A, "De Bank", 1),
        (A, "Bank", 1), (A, "De Duitse Bank", 8 / 11),
        (A, "Federal Reserve", 8 / 19),
    ],
    "editex": [
        (A, A, 1), (A, "Nederlandsche Bank", 6 / 7),
        (A, "Bank de Nederlandsche", 11 / 21), (A, "De Nederlandse Bank", 19 / 21),
        (A, "De Nederlancsh Bank", 37 / 42), (A, "De Bank", 8 / 21),
        (A, "Bank", 5 / 21), (A, "De Duitse Bank", 13 / 21),
        (A, "Federal Reserve", 1 / 3),
    ],
    "lig_3": [
        (A, A, 1), (A, "Nederlandsche Bank", 0.4),
        (A, "Bank de Nederlandsche", 4 / 15), (A, "De Nederlandse Bank", 13 / 14),
        (A, "De Nederlancsh Bank", 8 / 9), (A, "De Bank", 0.3),
        (A, "Bank", 0.0), (A, "De Duitse Bank", 6 / 17),
        (A, "Federal Reserve", 2 / 17),
    ],
    "typo": [
        (A, A, 1), (A, "Nederlandsche Bank", 6 / 7),
        (A, "Bank de Nederlandsche", 43 / 84), (A, "De Nederlandse Bank", 19 / 21),
        (A, "De Nederlancsh Bank", 37 / 42), (A, "De Bank", 1 / 3),
        (A, "Bank", 4 / 21), (A, "De Duitse Bank", 0.49642190479096915),
        (A, "Federal Reserve", 0.2664967491513207),
    ],
    "ssk": [
        (A, A, 1), (A, "Nederlandsche Bank", 0.9228829701817861),
        (A, "Bank de Nederlandsche", 0.7711353570271147),
        (A, "De Nederlandse Bank", 0.9377381283200467),
        (A, "De Nederlancsh Bank", 0.9411991279605375),
        (A, "De Bank", 0.5230048581284561), (A, "Bank", 0.24487267643945035),
        (A, "De Duitse Bank", 0.45427562753677897),
        (A, "Federal Reserve", 0.47482190774345556),
    ],
    "refined_soundex": [
        (A, A, 1), (A, "Nederlandsche Bank", 10 / 11),
        (A, "Bank de Nederlandsche", 4 / 11), (A, "De Nederlandse Bank", 1.0),
        (A, "De Nederlancsh Bank", 10 / 11), (A, "De Bank", 4 / 11),
        (A, "De Nederlandsche Benk", 1.0), (A, "De Duitse Bank", 7 / 11),
        (A, "Federal Reserve", 4 / 11),
    ],
    "double_metaphone": [
        (A, A, 1), (A, "Nederlandsche Bank", 0.91666666666666666),
        (A, "Bank de Nederlandsche", 0.5),
        (A, "De Nederlandse Bank", 0.91666666666666666),
        (A, "De Nederlancsh Bank", 0.91666666666666666),
        (A, "De Bank", 0.41666666666666663),
        (A, "De Nederlandsche Benk", 1.0),
        (A, "De Duitse Bank", 0.5833333333333333),
        (A, "Federal Reserve", 0.33333333333333337),
    ],
}


def test_all_29_reference_metrics_present():
    assert len(M.METRIC_FUNCTIONS) == 29
    assert not M.UNIMPLEMENTED_METRICS


def test_double_metaphone_codes():
    from name_matching_spark.nm_core.phonetic import double_metaphone
    assert double_metaphone("Christopher") == "KRSTFR,"
    assert double_metaphone("Schmidt") == "XMT,SMT"
    assert double_metaphone("Smith") == "SM0,XMT"
    assert double_metaphone("Niall") == "NL,"


def _cases():
    for name, rows in GOLDEN.items():
        for a, b, exp in rows:
            yield pytest.param(name, a, b, exp, id=f"{name}:{b[:24]}")


@pytest.mark.parametrize("name,a,b,expected", list(_cases()))
def test_metric_golden(name, a, b, expected):
    fn = M.METRIC_FUNCTIONS[name]
    assert fn(a, b) == pytest.approx(expected)


def test_registry_defaults_column_order():
    reg = M.make_metric_registry()
    assert list(reg.keys()) == ["multiset", "Subsequence", "fuzzy", "edit"]
    fns = M.flat_metric_fns()
    assert [f.__name__ for f in fns] == [
        "sim_overlap", "sim_weighted_jaccard", "sim_ratcliff_obershelp",
        "sim_fuzzy_wuzzy_token_sort", "sim_editex",
    ]


def test_registry_unknown_metric():
    with pytest.raises(TypeError):
        M.make_metric_registry(["no_such_metric"])
