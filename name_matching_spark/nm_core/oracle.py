"""Dependency-free end-to-end oracle of the reference matching semantics.

Mirrors ``NameMatcher.match_names`` (default configuration path,
/root/reference/name_matching/name_matcher.py:646-792) and the ``run_nm``
driver shape (exact-merge short-circuit + fuzzy remainder + threshold,
run_nm.py:264-380) in pure Python/NumPy.  The Spark pipeline is compared
against this oracle row-by-row; the oracle itself is validated against the
reference's published golden values (tests/test_metrics_golden.py and the
500-name corpus accuracy anchor).
"""

from __future__ import annotations

from dataclasses import dataclass

from .metrics import DEFAULT_METRICS, flat_metric_fns
from .preprocess import (
    PreprocessConfig,
    common_word_set,
    legal_word_set,
    light_preprocess_name,
    pipeline_preprocess_name,
    strip_words,
)
from .tfidf import TfidfOracle


@dataclass
class OracleMatch:
    query_id: int
    original_name: str
    match_id: int | None
    match_name: str | None
    score: float


def reduce_names_local(names: list[str],
                       occurrence_count: int = 3) -> list[str]:
    """Oracle twin of pipeline.reduce_query_names (reference
    _preprocess_reduce): word counts over the WHOLE column, each string
    keeps only words whose count is below ``occurrence_count`` times the
    count of its own rarest word; word order preserved."""
    from collections import Counter

    counts: Counter = Counter(
        w for n in names for w in n.split(" ") if w)
    out = []
    for n in names:
        ws = [w for w in n.split(" ") if w]
        if not ws:
            out.append("")
            continue
        min_cnt = min(counts[w] for w in ws)
        out.append(" ".join(
            w for w in ws if counts[w] < occurrence_count * min_cnt))
    return out


class OracleMatcher:
    """Pure-Python equivalent of NameMatcher (1:N best match)."""

    def __init__(
        self,
        top_n: int = 50,
        metrics=DEFAULT_METRICS,
        cfg: PreprocessConfig = PreprocessConfig(),
        legal_suffixes: bool = False,
        common_words: bool = False,
        cut_off: float = 0.01,
        prefix_size: int | None = None,
        df_cap_frac: float | None = 0.25,
        preprocess_split: bool = False,
    ):
        self.top_n = top_n
        self.prefix_size = prefix_size
        self.df_cap_frac = df_cap_frac
        self.preprocess_split = preprocess_split
        self.fns = flat_metric_fns(metrics)
        self.cfg = cfg
        self._legal_suffixes = legal_suffixes
        self._common_words = common_words
        self._cut_off = cut_off
        self.word_set: set[str] = set()
        self.master_names: list[str] = []
        self.oracle = TfidfOracle()

    def load_master(self, names: list[str]) -> None:
        self.master_names = [pipeline_preprocess_name(n, self.cfg)
                             for n in names]
        if self._legal_suffixes:
            self.word_set |= legal_word_set()
        if self._common_words:
            self.word_set |= common_word_set(self.master_names, self._cut_off)
        self.oracle.fit_master(self.master_names)

    def _score(self, query: str, cand_names: list[str]) -> list[float]:
        """Mean metric score per candidate."""
        means = []
        for c in cand_names:
            scores = [fn(str(query), str(c)) for fn in self.fns]
            means.append(sum(scores) / len(scores))
        return means

    def _gen_candidates(self, queries: list[str]):
        if self.prefix_size is not None:
            return self.oracle.top_n_prefix(
                queries, self.top_n, prefix_size=self.prefix_size,
                df_cap_frac=self.df_cap_frac)
        return self.oracle.top_n(queries, self.top_n)

    def candidate_ids(self, queries: list[str]) -> list[list[int]]:
        """Per query: candidate master ids in ranking-tie-break order.

        Default: the blocker's (cosine desc, mid asc) order.  With
        preprocess_split, a second candidate search runs on the common-
        word-reduced query names and the sets merge like the pipeline's
        union-agg (rank := min rank across the two sets), ordered by
        (min_rank, mid) -- the Spark window's (rank asc, mid asc)
        tie-break."""
        cands = self._gen_candidates(queries)
        if not self.preprocess_split:
            return [[m for m, _ in cl] for cl in cands]
        cands2 = self._gen_candidates(reduce_names_local(queries))
        merged: list[list[int]] = []
        for cl, cl2 in zip(cands, cands2):
            best: dict[int, int] = {}
            for lst in (cl, cl2):
                for rank, (mid, _) in enumerate(lst, start=1):
                    best[mid] = min(best.get(mid, rank), rank)
            merged.append([mid for mid, _ in
                           sorted(best.items(), key=lambda t: (t[1], t[0]))])
        return merged

    def match(self, query_names: list[str]) -> list[OracleMatch]:
        queries = [pipeline_preprocess_name(n, self.cfg)
                   for n in query_names]
        cand_lists = self.candidate_ids(queries)
        out: list[OracleMatch] = []
        for qid, (q, cand_ids) in enumerate(zip(queries, cand_lists)):
            if not cand_ids:
                out.append(OracleMatch(qid, q, None, None, 0.0))
                continue
            cand_names = [self.master_names[m] for m in cand_ids]
            means = self._score(q, cand_names)
            # argmax, ties by first occurrence (candidates are ordered by
            # cosine desc / id asc, making the winner deterministic)
            best = max(range(len(means)), key=lambda i: (means[i], -i))
            score = 100.0 * means[best]
            match_id, match_name = cand_ids[best], cand_names[best]
            if self.word_set:
                # postprocess: rescore winner on word-stripped names
                q2 = strip_words(q, self.word_set)
                c2 = strip_words(match_name, self.word_set)
                scores = [fn(q2, c2) for fn in self.fns]
                score = 100.0 * sum(scores) / len(scores)
            out.append(OracleMatch(qid, q, match_id, match_name, score))
        return out


def run_nm_oracle_pairs(
    names_a: list[str],
    names_b: list[str],
    threshold: float = 95.0,
    **matcher_kwargs,
) -> list[tuple[int, int, float, str]]:
    """match_names-shaped oracle at pair granularity, mirroring the Spark
    pipeline's exact-join semantics: ALL (a, b) pairs with equal non-empty
    light names (score 100, source 'exact'), then the fuzzy best match for
    every unmatched a above threshold.  Returns (i, j, score, source)."""
    la = [light_preprocess_name(n) for n in names_a]
    lb = [light_preprocess_name(n) for n in names_b]
    b_map: dict[str, list[int]] = {}
    for j, n in enumerate(lb):
        if n:
            b_map.setdefault(n, []).append(j)
    rows: list[tuple[int, int, float, str]] = []
    unmatched: list[int] = []
    for i, n in enumerate(la):
        if n and n in b_map:
            rows.extend((i, j, 100.0, "exact") for j in b_map[n])
        else:
            unmatched.append(i)
    if unmatched:
        m = OracleMatcher(**matcher_kwargs)
        m.load_master(lb)
        for i, om in zip(unmatched, m.match([la[i] for i in unmatched])):
            if om.match_id is not None and om.score > threshold:
                rows.append((i, om.match_id, om.score, "fuzzy"))
    return [r for r in rows if r[2] > threshold]


def run_nm_oracle_pairs_variant(
    names_a: list[str],
    names_b: list[str],
    number_of_matches: int,
    threshold: float = 95.0,
    metrics=DEFAULT_METRICS,
    **matcher_kwargs,
) -> list[tuple[int, int, float, int, str]]:
    """Pairs oracle for the O18 ranking-variant dispatch
    (number_of_matches == metric-group count or metric count): per
    unmatched query, the (n_candidates, n_metrics) score matrix is
    ranked by ``rate_matches_local`` and each output slot emits the
    chosen candidate with score = 100 * its overall mean.  Exact matches
    occupy slot 0.  Returns (i, j, score, position, source)."""
    import numpy as np

    from .ranking import metric_group_sizes, rate_matches_local

    la = [light_preprocess_name(n) for n in names_a]
    lb = [light_preprocess_name(n) for n in names_b]
    b_map: dict[str, list[int]] = {}
    for j, n in enumerate(lb):
        if n:
            b_map.setdefault(n, []).append(j)
    rows: list[tuple[int, int, float, int, str]] = []
    unmatched: list[int] = []
    for i, n in enumerate(la):
        if n and n in b_map:
            rows.extend((i, j, 100.0, 0, "exact") for j in b_map[n])
        else:
            unmatched.append(i)
    if unmatched:
        m = OracleMatcher(metrics=metrics, **matcher_kwargs)
        m.load_master(lb)
        gs = metric_group_sizes(metrics)
        queries = [pipeline_preprocess_name(la[i], m.cfg)
               for i in unmatched]
        cand_lists = m.candidate_ids(queries)
        for i, q, cand_ids in zip(unmatched, queries, cand_lists):
            if not cand_ids:
                continue
            mat = np.array(
                [[fn(str(q), str(m.master_names[mid])) for fn in m.fns]
                 for mid in cand_ids])
            for slot, ci in enumerate(
                    rate_matches_local(mat, number_of_matches, gs)):
                score = 100.0 * float(mat[ci].mean())
                if score > threshold:
                    rows.append((i, cand_ids[ci], score, slot, "fuzzy"))
    return [r for r in rows if r[2] > threshold]


def connected_components_local(
    edges: list[tuple[str, str]],
) -> dict[str, str]:
    """Union-find transitive closure; component = min node id (string
    order), the same labeling the Spark hash-min operator converges to."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def run_nm_oracle(
    names_a: list[str],
    names_b: list[str],
    threshold: float = 95.0,
    **matcher_kwargs,
) -> dict[int, tuple[int, float]]:
    """run_nm.match_names-shaped oracle: light preprocess, exact-merge
    short-circuit (score 100), fuzzy match of the remainder, threshold.

    Returns {a_id: (b_id, score)} for rows above threshold."""
    a = [light_preprocess_name(n) for n in names_a]
    b = [light_preprocess_name(n) for n in names_b]
    b_index: dict[str, int] = {}
    for i, n in enumerate(b):
        b_index.setdefault(n, i)  # first match wins on duplicates
    result: dict[int, tuple[int, float]] = {}
    unmatched: list[int] = []
    for i, n in enumerate(a):
        if n in b_index:
            result[i] = (b_index[n], 100.0)
        else:
            unmatched.append(i)
    if unmatched:
        m = OracleMatcher(**matcher_kwargs)
        m.load_master(b)
        for i, om in zip(unmatched, m.match([a[i] for i in unmatched])):
            if om.match_id is not None:
                result[i] = (om.match_id, om.score)
    return {i: (j, s) for i, (j, s) in result.items() if s > threshold}
