"""P/R verification of the Kotlin fixture against @ast annotations
(reference test: ast/src/testing/mod.rs:342-356)."""

import pytest

from harness import graph_index_for_repo, verify_fixture

KOTLIN_FIXTURES = ["kotlin"]


@pytest.fixture(scope="module")
def kotlin_graph(spark):
    from stakgraph_spark.pipeline import build_graph
    from stakgraph_spark.source import fixture_source_df

    src = fixture_source_df(spark, {f: "kotlin" for f in KOTLIN_FIXTURES})
    g = build_graph(spark, src)
    nodes = g.nodes.persist()
    edges = g.edges.persist()
    nodes.count(), edges.count()
    return nodes, edges


@pytest.mark.parametrize("fixture", KOTLIN_FIXTURES)
def test_kotlin_fixture(kotlin_graph, fixture):
    nodes, edges = kotlin_graph
    gi = graph_index_for_repo(nodes, edges, f"fixtures/{fixture}")
    failures, items = verify_fixture(fixture, "kotlin", gi)
    score = 1 - len(failures) / max(items, 1)
    msg = "\n".join(failures[:60])
    assert score >= 0.95, f"P/R {score:.3f} ({len(failures)}/{items} failed)\n{msg}"
