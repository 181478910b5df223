"""P/R verification of the Go fixtures against @ast annotations."""

import pytest

from harness import graph_index_for_repo, verify_fixture

GO_FIXTURES = ["go", "go_non_web"]


@pytest.fixture(scope="module")
def go_graph(spark):
    from stakgraph_spark.pipeline import build_graph
    from stakgraph_spark.source import fixture_source_df

    src = fixture_source_df(spark, {f: "go" for f in GO_FIXTURES})
    g = build_graph(spark, src)
    nodes = g.nodes.persist()
    edges = g.edges.persist()
    nodes.count(), edges.count()
    return nodes, edges


@pytest.mark.parametrize("fixture", GO_FIXTURES)
def test_go_fixture(go_graph, fixture):
    nodes, edges = go_graph
    gi = graph_index_for_repo(nodes, edges, f"fixtures/{fixture}")
    failures, items = verify_fixture(fixture, "go", gi)
    score = 1 - len(failures) / max(items, 1)
    msg = "\n".join(failures[:60])
    assert score >= 0.95, f"P/R {score:.3f} ({len(failures)}/{items} failed)\n{msg}"
