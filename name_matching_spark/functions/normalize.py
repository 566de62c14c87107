"""Name-normalization column functions.

Two tiers:

* ``normalize_basic(col)`` -- the SQL-expressible subset (non-word strip,
  whitespace collapse, lowercase, trim) built from JVM-side functions so it
  stays inside whole-stage codegen and is verifiable against a DuckDB
  oracle.  Used when no dictionary replacements are configured.
* ``preprocess_udf(cfg)`` / ``light_preprocess_udf()`` -- Arrow-batched
  pandas UDFs wrapping the nm_core kernel for byte-exact reference
  semantics (transliteration + legal/common dictionary replacement), used
  on the full-parity path.  The kernel is identical to the local oracle's,
  so Spark output matches the oracle per row by construction.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..nm_core.preprocess import (
    PreprocessConfig,
    light_preprocess_name,
    pipeline_preprocess_name,
)

# Matches nm_core.preprocess.clean_non_word + lower: [^\w\-\&\#] -> ' ',
# collapse whitespace, trim, lower.  NOTE: Spark/RE2-class \w differs from
# Python \w only on exotic unicode; inputs here are ASCII after extraction.
NON_WORD_PATTERN = r"[^\w\-\&\#]"


def normalize_basic(col: Column) -> Column:
    """JVM-side normalization (codegen-friendly, oracle-checkable)."""
    c = F.regexp_replace(col, NON_WORD_PATTERN, " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.lower(F.trim(c))


def preprocess_udf(cfg: PreprocessConfig = PreprocessConfig()):
    """Full NameMatcher-semantics normalization as a pandas UDF."""

    @F.pandas_udf(StringType())
    def _pp(names: pd.Series) -> pd.Series:
        return names.astype("object").map(
            lambda n: pipeline_preprocess_name(n, cfg))

    return _pp


def light_preprocess_udf():
    """run_nm-style light normalization (exact-join key) as a pandas UDF."""

    @F.pandas_udf(StringType())
    def _lp(names: pd.Series) -> pd.Series:
        return names.astype("object").map(light_preprocess_name)

    return _lp
