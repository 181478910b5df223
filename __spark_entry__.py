"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: per-language document stats over sf0.001 (exercises
                scan -> transform -> aggregate through the engine's catalog).
queries()     — one callable per implemented operator (stakgraph_spark.textops
                catalog, 31 entries: canonical keys, sha256 invariant,
                exact/MinHash-LSH/SimHash/embedding-cosine dedup (pairs over
                exact-dedup representatives with a salted band join; cosine
                near-dups via the vectorized LSH banding + exact verify),
                fp-keyed n-gram Jaccard, lang-ID/quality/token text analysis,
                fingerprinting, brute-force ANN + LSH-bucketed ANN +
                IVF-Flat ANN + embedder-fed document ANN, serving-layer
                search/fulltext/BFS/k-hop/coverage ops driven through their
                real operators (search_nodes, fulltext_search, bfs_distances,
                k_hop, coverage_stats vs recursive-CTE / per-tier SQL
                oracles), and five KG link-plane
                operator shapes (priority cascade, masked-path
                request/endpoint join, longest-prefix rewrite,
                same-then-global symbol resolution, library USES join)
                oracle-checked on the driver's testdata).
oracle_sql()  — DuckDB-equivalent ANSI SQL per query.

The KG-construction pipeline itself (stakgraph_spark.pipeline.build_graph) is
verified separately by `python -m pytest tests/` against the reference's @ast
fixture annotations (P/R >= 0.95 per BASELINE.md) — its input is a source-code
table, which the driver's testdata views don't carry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from stakgraph_spark.textops.catalog import CATALOG

    fn, _ = CATALOG["doc_stats"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from stakgraph_spark.textops.catalog import CATALOG

    return {name: fn for name, (fn, _sql) in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    # entries with sql=None are non-SQL-expressible (batched-Python
    # embedding); the driver records the weaker rows-only check for them
    from stakgraph_spark.textops.catalog import CATALOG

    return {name: sql for name, (_fn, sql) in CATALOG.items()
            if sql is not None}
