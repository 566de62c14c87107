"""TF-IDF + top-n oracle unit tests (sklearn-formula arithmetic)."""

import math

import numpy as np
import pytest

from name_matching_spark.nm_core.tfidf import TfidfOracle, char_ngrams


def test_char_ngrams_sklearn_semantics():
    assert char_ngrams("abcd", (2, 2)) == ["ab", "bc", "cd"]
    assert char_ngrams("abcd", (2, 3)) == ["ab", "bc", "cd", "abc", "bcd"]
    assert char_ngrams("a", (2, 3)) == []
    # spaces are characters too (no padding, whole string)
    assert "c d" in char_ngrams("ab c d", (3, 3))


def test_idf_formula():
    o = TfidfOracle((2, 2)).fit(["ab", "ab", "cd"])
    n = 3
    idf_ab = math.log((1 + n) / (1 + 2)) + 1
    idf_cd = math.log((1 + n) / (1 + 1)) + 1
    assert o.idf_[o.vocabulary_["ab"]] == pytest.approx(idf_ab)
    assert o.idf_[o.vocabulary_["cd"]] == pytest.approx(idf_cd)


def test_transform_l2_and_sum_norm():
    o = TfidfOracle((2, 2)).fit(["abab", "bcbc", "abbc"])
    x = o.transform(["abab"])
    assert np.linalg.norm(x[0]) == pytest.approx(1.0)
    xm = o.transform(["abab"], sum_normalize=True)
    assert xm[0].sum() == pytest.approx(1.0)


def test_oov_ngrams_dropped():
    o = TfidfOracle((2, 2)).fit_master(["abcd"])
    x = o.transform(["zzab"])  # 'zz', 'za' OOV; only 'ab' survives
    assert np.count_nonzero(x[0]) == 1


def test_top_n_deterministic_ties():
    o = TfidfOracle((2, 2)).fit_master(["abcd", "abcd", "xyzw"])
    res = o.top_n(["abcd"], top_n=2)[0]
    # masters 0 and 1 tie exactly; tie-break by master id ascending
    assert [m for m, _ in res] == [0, 1]
    assert res[0][1] == pytest.approx(res[1][1])


def test_top_n_nonzero_only():
    o = TfidfOracle((2, 2)).fit_master(["abcd", "efgh"])
    res = o.top_n(["abxx"], top_n=50)[0]
    assert [m for m, _ in res] == [0]  # zero-cosine master excluded
