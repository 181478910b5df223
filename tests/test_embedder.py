"""Embedder interface: capability flags, deterministic stub contracts, and
the end-to-end embed -> LSH -> cosine-argmax ANN path (reference
lang/embedding.rs:1-47 re-expressed as a capability-gated batch interface)."""

import math

import pytest

from stakgraph_spark.textops.embedder import (EMBED_DIM, HashEmbedder,
                                              ann_lsh_best,
                                              available_backends,
                                              embed_documents, make_embedder)


def test_capability_flags():
    caps = available_backends()
    assert caps["hash"] is True
    assert caps["bge-small"] is False  # no wheels/weights in this container
    with pytest.raises(NotImplementedError):
        make_embedder("bge-small")


def test_hash_embedder_contracts():
    emb = HashEmbedder()
    a, b, c = emb.embed_batch(["the quick brown fox", "the quick brown fox",
                               "a completely different document body"])
    assert len(a) == EMBED_DIM
    assert a == b, "identical text must embed identically"
    assert a != c
    for v in (a, b, c):
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-6, "unit norm"
    # empty text is well-defined, not NaN
    (z,) = emb.embed_batch([""])
    assert abs(math.sqrt(sum(x * x for x in z)) - 1.0) < 1e-6


def test_embed_to_ann_end_to_end(spark):
    """Near-duplicate docs (token-overlapping) must find each other as best
    neighbors through the full embed -> LSH-bucket -> cosine path."""
    base = ("spark catalyst optimizer rewrites logical plans into physical "
            "plans using cost based rules and adaptive execution " * 3)
    other = ("completely unrelated text about cooking pasta with garlic "
             "butter and fresh basil leaves in a cast iron pan " * 3)
    rows = [(0, base), (1, base + " extra trailing tokens"),
            (2, other), (3, other + " with one more sentence")]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")

    emb = embed_documents(docs, backend="hash")
    got = {r["doc_id"]: r["embedding"] for r in emb.collect()}
    assert len(got) == 4 and all(len(v) == EMBED_DIM for v in got.values())

    best = {r["qid"]: (r["best_neighbor"], r["best_cos"])
            for r in ann_lsh_best(emb, n_queries=4).collect()}
    assert best[0][0] == 1 and best[1][0] == 0, best
    assert best[2][0] == 3 and best[3][0] == 2, best
    assert all(cos > 0.8 for _, cos in best.values()), best
