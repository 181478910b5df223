"""P/R verification of the Ruby (rails) fixture against @ast annotations."""

import pytest

from harness import graph_index_for_repo, verify_fixture

RUBY_FIXTURES = ["ruby"]


@pytest.fixture(scope="module")
def ruby_graph(spark):
    from stakgraph_spark.pipeline import build_graph
    from stakgraph_spark.source import fixture_source_df

    src = fixture_source_df(spark, {f: "ruby" for f in RUBY_FIXTURES})
    g = build_graph(spark, src)
    nodes = g.nodes.persist()
    edges = g.edges.persist()
    nodes.count(), edges.count()
    return nodes, edges


@pytest.mark.parametrize("fixture", RUBY_FIXTURES)
def test_ruby_fixture(ruby_graph, fixture):
    nodes, edges = ruby_graph
    gi = graph_index_for_repo(nodes, edges, f"fixtures/{fixture}")
    failures, items = verify_fixture(fixture, "ruby", gi)
    score = 1 - len(failures) / max(items, 1)
    msg = "\n".join(failures[:60])
    assert score >= 0.95, f"P/R {score:.3f} ({len(failures)}/{items} failed)\n{msg}"
