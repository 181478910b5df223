"""Text-embedding interface — capability-flagged backends feeding the ANN
operators (reference lang/embedding.rs:1-47: BGE-small-en 384-d embeddings
with attention-weighted mean pooling + L2 normalization).

Backends (the multimodal stub pattern, textops/multimodal.py):

* "hash"      — deterministic, dependency-free stand-in: token -> md5-hashed
                dimension with a signed log-tf weight, L2-normalized.  NOT
                semantically meaningful, but it preserves every contract the
                real backend has — shape (EMBED_DIM float32), determinism,
                unit norm, identical-text => identical vector — so the full
                ANN path (embed -> LSH band bucket -> in-bucket cosine
                argmax) is production-shaped and testable end-to-end.
* "bge-small" — the real model.  Requires sentence-transformers (or an ONNX
                runtime) + model weights, which this environment does not
                ship; `available()` reports False and construction raises
                NotImplementedError.  On a cluster with the wheel installed
                the class body is the only thing to fill in — callers are
                already batch-shaped.

Scale design: embedding is one mapInPandas pass; the model is constructed
once per Python worker (module-level cache), texts flow in Arrow batches,
and the output is a narrow (doc_id, embedding) row — documents' text never
re-emits, so downstream ANN joins shuffle ~1.5 KB/row, not documents.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, FloatType, LongType, StructField,
                               StructType)

EMBED_DIM = 384  # BGE-small-en output width (embedding.rs:14)

EMBEDDING_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("embedding", ArrayType(FloatType()), False),
])


class HashEmbedder:
    """Deterministic stand-in embedder (see module docstring)."""

    name = "hash"

    def __init__(self, dim: int = EMBED_DIM):
        self.dim = dim

    @staticmethod
    def available() -> bool:
        return True

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        out = []
        for text in texts:
            vec = [0.0] * self.dim
            tf: dict[str, int] = {}
            for tok in (text or "").lower().split():
                tok = tok.strip(".,;:!?()[]{}\"'")
                if tok:
                    tf[tok] = tf.get(tok, 0) + 1
            for tok, cnt in tf.items():
                h = hashlib.md5(tok.encode("utf-8", "ignore")).digest()
                idx = int.from_bytes(h[:4], "big") % self.dim
                sign = 1.0 if h[4] & 1 else -1.0
                vec[idx] += sign * (1.0 + math.log(cnt))
            norm = math.sqrt(sum(x * x for x in vec))
            if norm == 0.0:
                vec[0] = 1.0
                norm = 1.0
            out.append([x / norm for x in vec])
        return out


class BgeSmallEmbedder:
    """Real-model backend — environment-gated (no wheels/weights here)."""

    name = "bge-small"

    def __init__(self, dim: int = EMBED_DIM):
        raise NotImplementedError(
            "bge-small requires sentence-transformers + model weights "
            "(not available in this environment); use backend='hash' for "
            "the deterministic stand-in")

    @staticmethod
    def available() -> bool:
        try:  # pragma: no cover - never true in this container
            import sentence_transformers  # noqa: F401
            return True
        except ImportError:
            return False


BACKENDS = {"hash": HashEmbedder, "bge-small": BgeSmallEmbedder}


def available_backends() -> dict[str, bool]:
    return {name: cls.available() for name, cls in BACKENDS.items()}


def make_embedder(backend: str = "hash", dim: int = EMBED_DIM):
    return BACKENDS[backend](dim)


def embed_documents(docs: DataFrame, backend: str = "hash",
                    dim: int = EMBED_DIM) -> DataFrame:
    """(doc_id, text) -> (doc_id, embedding) in one mapInPandas pass.

    The embedder is built once per worker invocation and fed whole Arrow
    batches; output rows never carry text."""
    import pandas as pd

    def batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        emb = make_embedder(backend, dim)
        for pdf in pdfs:
            vecs = emb.embed_batch(list(pdf["text"]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": vecs})

    return docs.select("doc_id", "text").mapInPandas(
        batches, schema=EMBEDDING_SCHEMA)


# ---- generic-dimension LSH ANN (the catalog's 64-dim operator, -----------
# parameterized so embedder output of any width rides the same plan) --------

def make_planes(dim: int, bands: int, bits: int) -> list[list[float]]:
    """Deterministic md5-derived random-hyperplane sign vectors (identical
    recipe to catalog.ANN_PLANES so behavior matches the oracle-checked
    operator)."""
    return [
        [1.0 if int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[0], 16) < 8
         else -1.0 for d in range(dim)]
        for p in range(bands * bits)
    ]


def ann_lsh_best(emb: DataFrame, n_queries: int = 20, dim: int = EMBED_DIM,
                 bands: int = 8, bits: int = 8) -> DataFrame:
    """(doc_id, embedding) -> (qid, best_neighbor, best_cos) for the first
    n_queries ids, candidates restricted to shared LSH band buckets.

    Bucket computation is ONE vectorized mapInPandas numpy matmul
    (catalog.lsh_buckets — replaces the round-4 per-row expression trees of
    bands*bits aggregate(zip_with) folds); the candidate set is a narrow
    (bi, bucket) equi-join of (id, int, int) rows, and embeddings join back
    only for surviving pairs."""
    from .catalog import _cosine_to_queries, lsh_buckets

    planes = make_planes(dim, bands, bits)
    e = emb.select(F.col("doc_id").alias("vec_id"), "embedding")
    b = lsh_buckets(e, planes, bands, bits)
    q = b.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), "bi", "bucket")
    cands = (q.join(b, ["bi", "bucket"])
             .where(F.col("vec_id") != F.col("qid"))
             .select("qid", "vec_id").distinct())
    qvecs = {int(r["vec_id"]): r["embedding"]
             for r in e.where(F.col("vec_id") < n_queries)
             .select("vec_id", "embedding").collect()}
    # exact cosine per surviving candidate, vectorized in numpy with the
    # fold's float semantics preserved bit-for-bit (catalog._cosine_to_
    # queries) — the interpreted per-pair aggregate(zip_with(...)) was
    # 106 s CPU for 650k candidates x 384 dims at sf1.0
    sims = _cosine_to_queries(cands, e, qvecs)
    return (sims.groupBy("qid")
            .agg(F.max_by("vec_id", "cos").alias("best_neighbor"),
                 F.round(F.max("cos"), 4).alias("best_cos")))
