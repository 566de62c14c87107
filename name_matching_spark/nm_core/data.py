"""Built-in normalization data.

The reference engine ships CSV dictionaries of legal-entity suffixes
(455 rows), common-word abbreviations (776 rows) and a transliteration map
(316 entries) in /root/reference/name_matching/data/, loaded at
name_matcher.py:335-338,371-374,1212-1215.  That data is MIT-licensed and
is ported verbatim in ``dictionaries.py`` (row order, duplicates and
trailing whitespace preserved — the replacement pass applies rules in CSV
file order).  This module exposes the loader API; every loader also
accepts an external CSV path so a deployment can plug in its own tables.
The rule-expansion machinery in ``preprocess.py`` defines the semantics;
these lists are swappable data.
"""

from __future__ import annotations

import csv
from pathlib import Path

from .dictionaries import (
    COMMON_WORDS_FULL,
    LEGAL_FORMS_FULL,
    TRANSLITERATION_MAP_FULL,
)

# Applied per-char after NFD decomposition (reference
# unicode_to_ascii, name_matcher.py:1095-1123).
TRANSLITERATION_MAP = TRANSLITERATION_MAP_FULL

# (abbreviation, full_name) rows, reference legal_names.csv shape/order.
LEGAL_FORMS = LEGAL_FORMS_FULL

# (word, short_form) rows, reference common_words.csv shape/order.
COMMON_WORDS = COMMON_WORDS_FULL


def load_pairs_csv(path: str | Path, col_a: str, col_b: str) -> list[tuple[str, str]]:
    """Load (col_a, col_b) tuples from a CSV with a header row."""
    out = []
    with open(path, newline="", encoding="utf-8") as fh:
        for row in csv.DictReader(fh):
            out.append((row[col_a], row[col_b]))
    return out


def legal_forms(csv_path: str | Path | None = None) -> list[tuple[str, str]]:
    """(abbreviation, full_name) rules; external CSV overrides built-ins."""
    if csv_path:
        return load_pairs_csv(csv_path, "abbreviation", "full_name")
    return list(LEGAL_FORMS)


def common_words(csv_path: str | Path | None = None) -> list[tuple[str, str]]:
    """(word, short_form) rules; external CSV overrides built-ins."""
    if csv_path:
        return load_pairs_csv(csv_path, "word", "short_form")
    return list(COMMON_WORDS)
