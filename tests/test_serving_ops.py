"""Serving-layer query ops over materialized graph tables (SURVEY.md §2E):
search_nodes mirrors query_nodes_with_count (graph_ops.rs:471-515),
vector_search mirrors graph_ops.rs:449-469 with the deterministic hash
embedder standing in for the model backend."""

import pytest
from pyspark.sql import functions as F

from stakgraph_spark.query import search_nodes, vector_search

ROWS = [
    # (node_type, name, file, lang, body)
    ("Function", "get_person", "src/app/people.py", "python",
     "def get_person(pid):\n    return db.query(Person).get(pid)\n"),
    ("Function", "create_person", "src/app/people.py", "python",
     "def create_person(data):\n    db.add(Person(**data))\n"),
    ("Function", "render_chart", "web/chart.ts", "typescript",
     "function renderChart(data) { return svg.plot(data); }"),
    ("Class", "Person", "src/app/models.py", "python",
     "class Person(Base):\n    name = Column(String)\n"),
    ("DataModel", "PersonSchema", "src/app/models.py", "python", ""),
]


@pytest.fixture(scope="module")
def nodes(spark):
    df = spark.createDataFrame(
        [{"node_type": t, "name": n, "file": f, "lang": lg, "body": b,
          "node_key": f"{t.lower()}-{n.lower()}-{f}-0"}
         for t, n, f, lg, b in ROWS])
    df.persist().count()
    return df


def test_search_nodes_filters_and_pages(nodes):
    hits = search_nodes(nodes, search="person").collect()
    assert {r["name"] for r in hits} == {
        "get_person", "create_person", "Person", "PersonSchema"}

    typed = search_nodes(nodes, search="person",
                         node_types=["Function"]).collect()
    assert {r["name"] for r in typed} == {"get_person", "create_person"}

    by_lang = search_nodes(nodes, language="typescript").collect()
    assert [r["name"] for r in by_lang] == ["render_chart"]

    # deterministic (node_type, node_key) order => stable pagination
    all_rows = search_nodes(nodes, limit=100).collect()
    page2 = search_nodes(nodes, offset=2, limit=2).collect()
    assert [r["node_key"] for r in page2] == \
        [r["node_key"] for r in all_rows[2:4]]


def test_search_nodes_matches_file_path(nodes):
    hits = search_nodes(nodes, search="chart.ts").collect()
    assert [r["name"] for r in hits] == ["render_chart"]


def test_vector_search_ranks_related_body_first(nodes):
    res = vector_search(nodes, "def get_person db query Person",
                        node_types=["Function"], limit=3).collect()
    assert res, "expected at least one scored hit"
    # the two person-handling functions must outrank the unrelated chart
    # renderer (exact order between the near-tied pair is embedder noise —
    # the hash backend's token collisions make that a coin flip)
    assert res[0]["name"] in ("get_person", "create_person")
    ranked = [r["name"] for r in res]
    assert ranked.index("render_chart") == len(ranked) - 1 \
        if "render_chart" in ranked else True
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)
    assert "embedding" not in res[0].asDict()


def test_vector_search_threshold_and_empty_bodies(nodes):
    # empty-bodied nodes (PersonSchema) never surface; threshold 1.1 > any
    # cosine yields an empty result, not an error
    res = vector_search(nodes, "person").collect()
    assert all(r["name"] != "PersonSchema" for r in res)
    assert vector_search(nodes, "person", similarity_threshold=1.1).count() == 0


def test_vector_search_exact_body_is_near_perfect(nodes):
    body = dict((n, b) for t, n, f, lg, b in ROWS)["render_chart"]
    res = vector_search(nodes, body, limit=1).collect()
    assert res[0]["name"] == "render_chart"
    assert res[0]["score"] > 0.99  # same text => cosine ~ 1 (float32 storage)


@pytest.fixture(scope="module")
def toy_edges(spark):
    # a -> b -> c -> e ;  a -> d -> e ;  f isolated-ish (e -> f)
    rows = [("a", "b"), ("b", "c"), ("c", "e"), ("a", "d"), ("d", "e"),
            ("e", "f")]
    return spark.createDataFrame(
        [{"src_key": s, "dst_key": d, "edge_type": "Calls"} for s, d in rows])


def test_bfs_distances_min_hops(spark, toy_edges):
    from stakgraph_spark.query import bfs_distances

    seeds = spark.createDataFrame([("a",)], "node_key string")
    got = {r["node_key"]: r["dist"]
           for r in bfs_distances(toy_edges, seeds).collect()}
    assert got == {"a": 0, "b": 1, "d": 1, "c": 2, "e": 2, "f": 3}


def test_bfs_distances_hop_bound_and_edge_types(spark, toy_edges):
    from stakgraph_spark.query import bfs_distances

    seeds = spark.createDataFrame([("a",)], "node_key string")
    got = {r["node_key"]: r["dist"]
           for r in bfs_distances(toy_edges, seeds, max_hops=1).collect()}
    assert got == {"a": 0, "b": 1, "d": 1}
    assert bfs_distances(toy_edges, seeds,
                         edge_types=["Handler"]).count() == 1  # seed only


def test_shortest_path_returns_one_min_path(toy_edges):
    from stakgraph_spark.query import shortest_path

    path = shortest_path(toy_edges, "a", "e")
    assert path in (["a", "b", "c", "e"], ["a", "d", "e"])
    assert path == ["a", "d", "e"]  # BFS => the 2-hop path, not the 3-hop
    assert shortest_path(toy_edges, "a", "a") == ["a"]
    assert shortest_path(toy_edges, "f", "a") == []          # unreachable
    assert shortest_path(toy_edges, "a", "f", max_hops=2) == []  # bound


def test_fulltext_search_ranks_by_term_matches(nodes):
    from stakgraph_spark.query import fulltext_search

    res = fulltext_search(nodes, "person db").collect()
    scores = {r["name"]: r["score"] for r in res}
    # whole-token matching: `get_person` the NAME is one token (underscores
    # stay inside tokens), but its body's `db.query(Person)` still yields
    # person+db -> score 2, tying the Person class (name + body mention)
    assert scores["get_person"] == 2 and scores["Person"] == 2
    assert res[0]["name"] == "Person"  # deterministic node_key tiebreak
    assert "render_chart" not in scores
    assert all(s >= 1 for s in scores.values())
    assert [r["score"] for r in res] == sorted(
        [r["score"] for r in res], reverse=True)


def test_fulltext_search_type_filter_and_empty_query(nodes):
    from stakgraph_spark.query import fulltext_search

    typed = fulltext_search(nodes, "person", node_types=["Class"]).collect()
    assert [r["name"] for r in typed] == ["Person"]
    assert fulltext_search(nodes, "").count() == 0
    assert fulltext_search(nodes, "%%% !!!").count() == 0


def test_fulltext_indexed_matches_direct(nodes):
    from stakgraph_spark.query import (build_fulltext_index, fulltext_search,
                                       fulltext_search_indexed)

    idx = build_fulltext_index(nodes)
    for q, types in [("person db", None), ("person", ["Class"]),
                     ("chart data svg", None), ("", None)]:
        direct = sorted(map(tuple, fulltext_search(nodes, q, types).collect()))
        via_idx = sorted(map(tuple,
                             fulltext_search_indexed(idx, q, types).collect()))
        assert direct == via_idx, q
