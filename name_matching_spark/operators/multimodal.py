"""Multimodal column plumbing (binary payloads with typed metadata).

Images/audio/video are opaque ``binary`` columns plus typed metadata.  The
decode/feature-extract kernels run as Arrow-batched ``mapInPandas`` so each
task processes whole record batches; the real codecs are STUBBED (no
image/audio libraries in this container) behind ``decoder=`` hooks, with a
deterministic fake decoder exercising the full Spark plumbing (schema,
batching, partitioning) so the pipeline shape is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = ("id string, byte_len int, media_type string, "
                     "width int, height int, ok boolean")
MEDIA_FEATURES_SCHEMA = "id string, features array<float>"


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder: pretends the md5 prefix
    encodes the dimensions.  Replace with a real codec via ``decoder=``."""
    if not payload:
        return {"media_type": "empty", "width": 0, "height": 0, "ok": False}
    h = hashlib.md5(payload).digest()
    return {
        "media_type": "image/fake",
        "width": 16 + h[0] % 240,
        "height": 16 + h[1] % 240,
        "ok": True,
    }


def real_decode(payload: bytes) -> dict:
    """Real decoder hook -- requires an image library absent here."""
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "pass decoder=fake_decode or a library-backed callable")


def decode_media(df: DataFrame, id_col: str, binary_col: str,
                 decoder=fake_decode) -> DataFrame:
    """-> (id, byte_len, media_type, width, height, ok) via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[binary_col]):
                payload = bytes(payload) if payload is not None else b""
                meta = decoder(payload)
                rows.append({"id": str(rid), "byte_len": len(payload),
                             **meta})
            yield pd.DataFrame(
                rows, columns=["id", "byte_len", "media_type", "width",
                               "height", "ok"])

    return df.select(id_col, binary_col).mapInPandas(
        run, schema=MEDIA_META_SCHEMA)


def extract_features(df: DataFrame, id_col: str, binary_col: str,
                     dim: int = 8) -> DataFrame:
    """-> (id, features): deterministic fake feature vector from payload
    bytes (md5-seeded), exercising the array<float> batch path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for rid, payload in zip(pdf[id_col], pdf[binary_col]):
                payload = bytes(payload) if payload is not None else b""
                h = hashlib.md5(payload).digest()
                ids.append(str(rid))
                feats.append([h[i % 16] / 255.0 for i in range(dim)])
            yield pd.DataFrame({"id": ids, "features": feats})

    return df.select(id_col, binary_col).mapInPandas(
        run, schema=MEDIA_FEATURES_SCHEMA)
