"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The decode step is STUBBED (this container ships no image/audio libraries):
`_decode_image` raises NotImplementedError unless `fake=True`, in which case
a deterministic pseudo-decode derived from the bytes' sha256 stands in. The
Spark-side plumbing — schema, Arrow batch shape, partition-aware mapInPandas,
metadata struct — is real and tested (tests/test_multimodal.py).

At 100 TB the pattern is: binaries live in their own partitioned table keyed
like everything else; feature extraction is a mapInPandas pass whose output
is a narrow typed row (never re-emitting the binary), so downstream joins and
dedup (embedding-cosine in catalog.py) shuffle features, not payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, LongType,
                               MapType, StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),      # image | audio | video
    StructField("payload", BinaryType(), True),    # opaque encoded bytes
    StructField("meta", MapType(StringType(), StringType()), True),
    StructField("repo", StringType(), True),       # partition carry-through
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("sha", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("width", LongType(), True),        # decoded dims (stub)
    StructField("height", LongType(), True),
    StructField("embedding", ArrayType(FloatType()), True),  # 16-dim feature
    StructField("repo", StringType(), True),
])


def _decode_image(payload: bytes, fake: bool):
    """Decode step — the real implementation needs PIL/libvips which this
    container does not ship. `fake=True` derives deterministic dimensions and
    a 16-dim feature from sha256(payload), preserving every downstream
    contract (types, determinism, batch shape)."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/libvips (not available in this "
            "container); pass fake=True for the deterministic stand-in")
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    emb = [((h[i] / 255.0) * 2 - 1) for i in range(16)]
    return width, height, emb


def extract_media_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """media table -> narrow feature rows via one mapInPandas pass.

    The binary column never leaves the worker: output rows carry only the
    hash + dims + a fixed-width embedding, so the downstream
    embedding-cosine near-dup join (catalog.q_ann_best_neighbor pattern)
    shuffles ~100 bytes/row instead of the payload."""
    def batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out = []
            for mid, kind, payload, repo in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"], pdf["repo"]):
                payload = payload or b""
                sha = hashlib.sha256(payload).hexdigest()
                row = {"media_id": mid, "kind": kind, "sha": sha,
                       "n_bytes": len(payload), "width": None, "height": None,
                       "embedding": None, "repo": repo}
                if kind == "image":
                    w, h, emb = _decode_image(payload, fake_decode)
                    row.update(width=w, height=h,
                               embedding=[float(x) for x in emb])
                out.append(row)
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    cols = ["media_id", "kind", "payload", "repo"]
    return (media.select(*cols)
            .repartition("repo")  # co-locate with the rest of the repo's rows
            .mapInPandas(batches, schema=FEATURE_SCHEMA))
