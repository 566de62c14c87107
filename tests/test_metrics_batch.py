"""Batch scoring kernels must be value-identical to the scalar oracle.

The scalar functions in nm_core.metrics are the reference-validated oracle
(golden values from the reference's own test suite); metrics_batch must
reproduce them bit-exactly on golden pairs, fuzz corpora and edge cases.
"""

import random

import numpy as np
import pytest

from name_matching_spark.nm_core import metrics as M
from name_matching_spark.nm_core import metrics_batch as MB
from name_matching_spark.sources.pages import (
    adjusted_names_corpus,
    names_corpus,
)

GOLDEN_PAIRS = [
    # the reference's golden test corpus shape (DNB name + perturbations)
    ("De Nederlandsche Bank", "De Nederlandsche Bank"),
    ("De Nederlandsche Bank", "de Nederlandsche Bank"),
    ("De Nederlandsche Bank", "De Nederlandsche Bank N.V."),
    ("De Nederlandsche Bank", "De Nederlandse Bank"),
    ("De Nederlandsche Bank", "Bank, De Nederlandsche"),
    ("De Nederlandsche Bank", "De Nederlandsche Bank Amsterdam"),
    ("De Nederlandsche Bank", "Nederlandsche Bank"),
    ("De Nederlandsche Bank", "Bank"),
    ("De Nederlandsche Bank", "XYZ Corp"),
]

EDGE_PAIRS = [
    ("", ""),
    ("a", ""),
    ("", "b"),
    ("acme", "acme"),
    ("x", "y"),
    ("ab", "ba"),
    ("aaa", "aaaa"),
    ("abcabc", "bcabca"),
    ("the, quick. brown", "quick the brown!"),
    ("Ünïcode Æ strasse", "unicode ae straße"),
    ("H", "W"),            # editex H/W special-cased boundary costs
    ("WH", "HW"),
    ("z" * 250, "z" * 249 + "q"),   # beyond the vectorized envelope
]


def _fuzz_pairs(n=1500, seed=7):
    names = [r["company_name"] for r in names_corpus(300)]
    adj = [r["company_name"] for r in adjusted_names_corpus(300)]
    rng = random.Random(seed)
    return [(rng.choice(adj), rng.choice(names)) for _ in range(n)]


@pytest.mark.parametrize("kernel_name", sorted(MB.BATCH_KERNELS))
def test_batch_kernel_matches_scalar(kernel_name):
    pairs = GOLDEN_PAIRS + EDGE_PAIRS + _fuzz_pairs()
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = MB.BATCH_KERNELS[kernel_name](a, b)
    fn = M.METRIC_FUNCTIONS[kernel_name]
    exp = np.array([fn(x, y) for x, y in pairs])
    np.testing.assert_allclose(got, exp, rtol=0, atol=1e-12)


def test_score_batch_matches_flat_fns():
    pairs = GOLDEN_PAIRS + EDGE_PAIRS + _fuzz_pairs(800, seed=11)
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    mat = MB.score_batch(a, b, M.DEFAULT_METRICS)
    fns = M.flat_metric_fns(M.DEFAULT_METRICS)
    exp = np.array([[fn(x, y) for fn in fns] for x, y in pairs])
    assert mat.shape == exp.shape
    np.testing.assert_allclose(mat, exp, rtol=0, atol=1e-12)


def test_flat_metric_columns_order():
    # column order must equal flat_metric_fns order (registry group order)
    names = MB.flat_metric_columns(M.DEFAULT_METRICS)
    fns = M.flat_metric_fns(M.DEFAULT_METRICS)
    assert [M.METRIC_FUNCTIONS[n] for n in names] == fns


def test_chunking_preserves_order():
    # force several chunks with a length-skewed corpus: results must land
    # back in input positions despite length-sorted internal chunks
    pairs = _fuzz_pairs(int(MB._CHUNK * 2.5), seed=3)
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = MB.editex_batch(a, b)
    exp = MB.editex_batch(a[:10], b[:10])
    np.testing.assert_allclose(got[:10], exp, rtol=0, atol=1e-12)


def test_gestalt_total_matches_difflib():
    from difflib import SequenceMatcher

    pairs = GOLDEN_PAIRS + EDGE_PAIRS + _fuzz_pairs(1200, seed=13)
    for a, b in pairs:
        exp = sum(m.size for m in SequenceMatcher(
            None, a, b, autojunk=False).get_matching_blocks())
        assert M._gestalt_total(a, b) == exp, (a, b)


def test_token_sort_key_cache_consistency():
    assert M.sim_fuzzy_wuzzy_token_sort("b a", "a b") == 1.0
    assert M.sim_fuzzy_wuzzy_token_sort("", "") == 1.0
    assert M.sim_fuzzy_wuzzy_token_sort("a", "") == 0.0


def test_score_batch_dedups_duplicate_pairs_bit_identically():
    # duplicate-heavy batch (real corpora repeat normalized names): the
    # dedup fast path must broadcast the unique rows back bit-identically
    base = GOLDEN_PAIRS + EDGE_PAIRS
    pairs = base * 40 + _fuzz_pairs(200, seed=17)
    rng = random.Random(23)
    rng.shuffle(pairs)
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    mat = MB.score_batch(a, b, M.DEFAULT_METRICS)
    fns = M.flat_metric_fns(M.DEFAULT_METRICS)
    exp = np.array([[fn(x, y) for fn in fns] for x, y in pairs])
    np.testing.assert_array_equal(mat, exp)
    # and the same pair must produce the same row wherever it appears
    seen = {}
    for i, p in enumerate(pairs):
        if p in seen:
            np.testing.assert_array_equal(mat[i], mat[seen[p]])
        else:
            seen[p] = i


def test_cross_batch_pair_cache_bit_identical():
    """The worker-lifetime pair cache (pairs repeating ACROSS Arrow
    batches) must return exactly the rows the kernel produced, survive
    partial-overlap batches, and recompute correctly after an
    overflow-triggered clear."""
    MB._PAIR_CACHE.clear()
    base = GOLDEN_PAIRS + EDGE_PAIRS + _fuzz_pairs(100, seed=29)
    a = [p[0] for p in base]
    b = [p[1] for p in base]
    cold = MB.score_batch(a, b, M.DEFAULT_METRICS)
    warm = MB.score_batch(a, b, M.DEFAULT_METRICS)        # all cache hits
    np.testing.assert_array_equal(cold, warm)

    fresh = _fuzz_pairs(50, seed=31)
    mixed_pairs = base + fresh
    mixed = MB.score_batch([p[0] for p in mixed_pairs],
                           [p[1] for p in mixed_pairs], M.DEFAULT_METRICS)
    np.testing.assert_array_equal(mixed[:len(base)], cold)
    MB._PAIR_CACHE.clear()
    nocache = MB.score_batch([p[0] for p in mixed_pairs],
                             [p[1] for p in mixed_pairs], M.DEFAULT_METRICS)
    np.testing.assert_array_equal(mixed, nocache)

    # overflow: cap smaller than the unique-pair count -> cache clears,
    # refills only UP TO the cap (ADVICE r4: a single batch with more
    # unique pairs than the whole cap must not leave the cache above it),
    # values unaffected
    old_max = MB._PAIR_CACHE_MAX
    try:
        MB._PAIR_CACHE_MAX = 8
        MB._PAIR_CACHE.clear()
        again = MB.score_batch(a, b, M.DEFAULT_METRICS)
        np.testing.assert_array_equal(again, cold)
        assert len(MB._PAIR_CACHE[tuple(
            MB.flat_metric_columns(M.DEFAULT_METRICS))]) <= 8
        rewarm = MB.score_batch(a, b, M.DEFAULT_METRICS)
        np.testing.assert_array_equal(rewarm, cold)
    finally:
        MB._PAIR_CACHE_MAX = old_max
        MB._PAIR_CACHE.clear()
