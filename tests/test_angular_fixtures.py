"""P/R verification of the Angular fixture against @ast annotations
(reference test: ast/src/testing/mod.rs:394-408).  Spec files are excluded
by the language's skip rules, in both the source walker and the harness."""

import pytest

from harness import graph_index_for_repo, verify_fixture

ANGULAR_FIXTURES = ["angular"]


@pytest.fixture(scope="module")
def angular_graph(spark):
    from stakgraph_spark.pipeline import build_graph
    from stakgraph_spark.source import fixture_source_df

    src = fixture_source_df(spark, {f: "angular" for f in ANGULAR_FIXTURES})
    g = build_graph(spark, src)
    nodes = g.nodes.persist()
    edges = g.edges.persist()
    nodes.count(), edges.count()
    return nodes, edges


@pytest.mark.parametrize("fixture", ANGULAR_FIXTURES)
def test_angular_fixture(angular_graph, fixture):
    nodes, edges = angular_graph
    gi = graph_index_for_repo(nodes, edges, f"fixtures/{fixture}")
    failures, items = verify_fixture(fixture, "angular", gi)
    score = 1 - len(failures) / max(items, 1)
    msg = "\n".join(failures[:60])
    assert score >= 0.95, f"P/R {score:.3f} ({len(failures)}/{items} failed)\n{msg}"
