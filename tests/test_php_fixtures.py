"""P/R verification of the PHP fixture against @ast annotations
(reference test: ast/src/testing/mod.rs:378-390)."""

import pytest

from harness import graph_index_for_repo, verify_fixture

PHP_FIXTURES = ["php"]


@pytest.fixture(scope="module")
def php_graph(spark):
    from stakgraph_spark.pipeline import build_graph
    from stakgraph_spark.source import fixture_source_df

    src = fixture_source_df(spark, {f: "php" for f in PHP_FIXTURES})
    g = build_graph(spark, src)
    nodes = g.nodes.persist()
    edges = g.edges.persist()
    nodes.count(), edges.count()
    return nodes, edges


@pytest.mark.parametrize("fixture", PHP_FIXTURES)
def test_php_fixture(php_graph, fixture):
    nodes, edges = php_graph
    gi = graph_index_for_repo(nodes, edges, f"fixtures/{fixture}")
    failures, items = verify_fixture(fixture, "php", gi)
    score = 1 - len(failures) / max(items, 1)
    msg = "\n".join(failures[:60])
    assert score >= 0.95, f"P/R {score:.3f} ({len(failures)}/{items} failed)\n{msg}"
