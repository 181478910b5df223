"""P/R verification of the C fixture against @ast annotations
(reference test: ast/src/testing/mod.rs:262-276)."""

import pytest

from harness import graph_index_for_repo, verify_fixture

C_FIXTURES = ["c"]


@pytest.fixture(scope="module")
def c_graph(spark):
    from stakgraph_spark.pipeline import build_graph
    from stakgraph_spark.source import fixture_source_df

    src = fixture_source_df(spark, {f: "c" for f in C_FIXTURES})
    g = build_graph(spark, src)
    nodes = g.nodes.persist()
    edges = g.edges.persist()
    nodes.count(), edges.count()
    return nodes, edges


@pytest.mark.parametrize("fixture", C_FIXTURES)
def test_c_fixture(c_graph, fixture):
    nodes, edges = c_graph
    gi = graph_index_for_repo(nodes, edges, f"fixtures/{fixture}")
    failures, items = verify_fixture(fixture, "c", gi)
    score = 1 - len(failures) / max(items, 1)
    msg = "\n".join(failures[:60])
    assert score >= 0.95, f"P/R {score:.3f} ({len(failures)}/{items} failed)\n{msg}"
