"""Entity-name extraction from raw page bytes.

``extract_name`` is the deterministic extractor required by the
BASELINE.json per-row invariant (byte-identical extracted text per url):
it pulls the <title> payload out of the html binary column.  Implemented as
an Arrow-batched pandas UDF (never per-row Python), falling back to the
``text`` column sentence pattern when no title is present.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_TITLE_RE = re.compile(rb"<title>(.*?)</title>", re.S)
_TEXT_RE = re.compile(r"homepage of (.*?)\. Contact")


def extract_name_bytes(html: bytes | None, text: str | None) -> str:
    """Pure extractor: deterministic function of the row payload."""
    if html:
        m = _TITLE_RE.search(html)
        if m:
            return m.group(1).decode("utf-8", "replace")
    if text:
        m2 = _TEXT_RE.search(text)
        if m2:
            return m2.group(1)
    return ""


@F.pandas_udf(StringType())
def extract_name(html: pd.Series, text: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_name_bytes(h, t) for h, t in zip(html, text)],
        dtype="object",
    )
