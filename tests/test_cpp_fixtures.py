"""P/R verification of the C++ fixtures against @ast annotations
(reference tests: ast/src/testing/mod.rs:278-310 — web_api and cuda are
built as separate repos)."""

import pytest

from harness import graph_index_for_repo, verify_fixture

CPP_FIXTURES = ["cpp/web_api", "cpp/cuda"]


@pytest.fixture(scope="module")
def cpp_graph(spark):
    from stakgraph_spark.pipeline import build_graph
    from stakgraph_spark.source import fixture_source_df

    src = fixture_source_df(spark, {f: "cpp" for f in CPP_FIXTURES})
    g = build_graph(spark, src)
    nodes = g.nodes.persist()
    edges = g.edges.persist()
    nodes.count(), edges.count()
    return nodes, edges


@pytest.mark.parametrize("fixture", CPP_FIXTURES)
def test_cpp_fixture(cpp_graph, fixture):
    nodes, edges = cpp_graph
    gi = graph_index_for_repo(nodes, edges, f"fixtures/{fixture}")
    failures, items = verify_fixture(fixture, "cpp", gi)
    score = 1 - len(failures) / max(items, 1)
    msg = "\n".join(failures[:60])
    assert score >= 0.95, f"P/R {score:.3f} ({len(failures)}/{items} failed)\n{msg}"
