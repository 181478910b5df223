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
