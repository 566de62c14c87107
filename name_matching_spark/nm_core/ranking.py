"""O18 ranking variants (reference ``_rate_matches`` parity).

The reference selects best candidates from the (n_candidates, n_metrics)
score matrix with a dispatch on ``number_of_matches``
(/root/reference/name_matching/name_matcher.py:882-915):

* ``1``                     -> argmax of the row means;
* ``== len(metric groups)`` -> one argmax per metric GROUP (mean over the
                               group's columns), output slot = group index;
* ``== total metric count`` -> one argmax per metric COLUMN;
* otherwise                 -> top-m rows by mean (argsort, descending).

``rate_matches_local`` is the NumPy twin used as the oracle by both the
unit tests (porting the reference's test_rate_matches golden table,
test_name_matcher.py:495-595) and the Spark operator tests.

Tie notes: np.argmax keeps the FIRST maximal row -- candidate order is
semantic, matching the reference.  The top-m argsort branch inherits
np.argsort's unstable ties exactly like the reference does.
"""

from __future__ import annotations

import numpy as np

from .metrics import make_metric_registry


def metric_group_sizes(metrics) -> list[int]:
    """Metric-group sizes in score-matrix column order."""
    return [len(v) for v in make_metric_registry(metrics).values()]


def rate_matches_local(
    match_score,
    number_of_matches: int,
    group_sizes: list[int],
) -> list[int]:
    """Indices of chosen candidates per output slot (reference dispatch)."""
    ms = np.asarray(match_score, dtype=float)
    n_groups = len(group_sizes)
    n_metrics = int(sum(group_sizes))
    if number_of_matches == 1:
        ind = [int(np.argmax(ms.mean(axis=1)))]
    elif number_of_matches == n_groups:
        ind = []
        idx = 0
        for size in group_sizes:
            ind.append(int(np.argmax(ms[:, idx: idx + size].mean(axis=1))))
            idx += size
    elif number_of_matches == n_metrics:
        ind = [int(i) for i in np.argmax(ms, axis=0).reshape(-1)]
    else:
        ind = [int(i) for i in
               np.argsort(ms.mean(axis=1))[-number_of_matches:][::-1]]
    return ind
