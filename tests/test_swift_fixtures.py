"""P/R verification of the Swift fixtures against @ast annotations
(reference test: ast/src/testing/mod.rs:358-366 — LegacyApp and ModernApp
are built as separate repos)."""

import pytest

from harness import graph_index_for_repo, verify_fixture

SWIFT_FIXTURES = ["swift/LegacyApp", "swift/ModernApp"]


@pytest.fixture(scope="module")
def swift_graph(spark):
    from stakgraph_spark.pipeline import build_graph
    from stakgraph_spark.source import fixture_source_df

    src = fixture_source_df(spark, {f: "swift" for f in SWIFT_FIXTURES})
    g = build_graph(spark, src)
    nodes = g.nodes.persist()
    edges = g.edges.persist()
    nodes.count(), edges.count()
    return nodes, edges


@pytest.mark.parametrize("fixture", SWIFT_FIXTURES)
def test_swift_fixture(swift_graph, fixture):
    nodes, edges = swift_graph
    gi = graph_index_for_repo(nodes, edges, f"fixtures/{fixture}")
    failures, items = verify_fixture(fixture, "swift", gi)
    score = 1 - len(failures) / max(items, 1)
    msg = "\n".join(failures[:60])
    assert score >= 0.95, f"P/R {score:.3f} ({len(failures)}/{items} failed)\n{msg}"
