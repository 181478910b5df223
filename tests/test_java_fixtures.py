"""P/R verification of the Java fixture against @ast annotations."""

import pytest

from harness import graph_index_for_repo, verify_fixture

JAVA_FIXTURES = ["java"]


@pytest.fixture(scope="module")
def java_graph(spark):
    from stakgraph_spark.pipeline import build_graph
    from stakgraph_spark.source import fixture_source_df

    src = fixture_source_df(spark, {f: "java" for f in JAVA_FIXTURES})
    g = build_graph(spark, src)
    nodes = g.nodes.persist()
    edges = g.edges.persist()
    nodes.count(), edges.count()
    return nodes, edges


@pytest.mark.parametrize("fixture", JAVA_FIXTURES)
def test_java_fixture(java_graph, fixture):
    nodes, edges = java_graph
    gi = graph_index_for_repo(nodes, edges, f"fixtures/{fixture}")
    failures, items = verify_fixture(fixture, "java", gi)
    score = 1 - len(failures) / max(items, 1)
    msg = "\n".join(failures[:60])
    assert score >= 0.95, f"P/R {score:.3f} ({len(failures)}/{items} failed)\n{msg}"
