"""Every catalog query must match its DuckDB oracle at sf0.001 —
mirrors the driver's CORRECTNESS gate (row count + schema + value hash,
order-insensitive)."""

import math
import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(rows, cols):
    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return str(bool(v))
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.6f}"
        return str(v)
    return sorted(",".join(cell(r[c]) for c in cols) for r in rows)


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _catalog():
    from stakgraph_spark.textops.catalog import CATALOG
    return CATALOG


@pytest.mark.parametrize("name", list(_catalog().keys()))
def test_catalog_query_matches_oracle(spark, ducks, name):
    fn, sql = _catalog()[name]
    if sql is None:
        # non-SQL-expressible (batched-Python embedding): rows-only check,
        # mirroring the driver's weaker gate for oracle-less entries
        assert fn(spark, SF_DIR).count() > 0
        return
    sdf = fn(spark, SF_DIR)
    srows = [r.asDict() for r in sdf.collect()]
    cols = sorted(sdf.columns)

    ddf = ducks.execute(sql).df()
    drows = ddf.to_dict("records")
    assert sorted(c.lower() for c in ddf.columns) == [c.lower() for c in cols], \
        f"schema mismatch: spark={cols} duck={sorted(ddf.columns)}"
    s = _canon(srows, cols)
    d = _canon(drows, cols)
    assert len(s) == len(d), f"row count: spark={len(s)} duck={len(d)}"
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{len(mismatches)} value mismatches, first: {mismatches[:3]}"


def test_ann_lsh_recall_vs_bruteforce(spark):
    """The LSH scale path is checked against the exact brute-force oracle:
    every LSH best_cos is <= the exact best_cos (candidate restriction can
    only lose), and recall@1 over the 20 query vectors stays useful."""
    from stakgraph_spark.textops.catalog import (q_ann_best_neighbor,
                                                 q_ann_lsh_best)
    exact = {r["qid"]: r for r in q_ann_best_neighbor(spark, SF_DIR).collect()}
    lsh = {r["qid"]: r for r in q_ann_lsh_best(spark, SF_DIR).collect()}
    assert lsh, "LSH returned no rows"
    hits = 0
    for qid, r in lsh.items():
        assert r["best_cos"] <= exact[qid]["best_cos"] + 1e-4, \
            f"LSH cos exceeds exact for qid={qid}"
        hits += int(r["best_neighbor"] == exact[qid]["best_neighbor"])
    recall = hits / len(exact)
    assert recall >= 0.5, f"recall@1 too low: {recall}"
