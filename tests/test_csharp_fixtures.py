"""P/R verification of the C# fixture against @ast annotations
(reference test: ast/src/testing/mod.rs:326-340)."""

import pytest

from harness import graph_index_for_repo, verify_fixture

CSHARP_FIXTURES = ["csharp"]


@pytest.fixture(scope="module")
def csharp_graph(spark):
    from stakgraph_spark.pipeline import build_graph
    from stakgraph_spark.source import fixture_source_df

    src = fixture_source_df(spark, {f: "csharp" for f in CSHARP_FIXTURES})
    g = build_graph(spark, src)
    nodes = g.nodes.persist()
    edges = g.edges.persist()
    nodes.count(), edges.count()
    return nodes, edges


@pytest.mark.parametrize("fixture", CSHARP_FIXTURES)
def test_csharp_fixture(csharp_graph, fixture):
    nodes, edges = csharp_graph
    gi = graph_index_for_repo(nodes, edges, f"fixtures/{fixture}")
    failures, items = verify_fixture(fixture, "csharp", gi)
    score = 1 - len(failures) / max(items, 1)
    msg = "\n".join(failures[:60])
    assert score >= 0.95, f"P/R {score:.3f} ({len(failures)}/{items} failed)\n{msg}"
