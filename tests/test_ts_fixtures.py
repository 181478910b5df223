"""P/R verification of the TypeScript/React/Next.js fixtures."""

import pytest

from harness import graph_index_for_repo, verify_fixture

CASES = [("typescript", "typescript"), ("react", "react"), ("nextjs", "react")]


@pytest.fixture(scope="module")
def ts_graph(spark):
    from stakgraph_spark.pipeline import build_graph
    from stakgraph_spark.source import fixture_source_df

    src = fixture_source_df(spark, {f: lang for f, lang in CASES})
    g = build_graph(spark, src)
    nodes = g.nodes.persist()
    edges = g.edges.persist()
    nodes.count(), edges.count()
    return nodes, edges


@pytest.mark.parametrize("fixture,lang", CASES)
def test_ts_fixture(ts_graph, fixture, lang):
    nodes, edges = ts_graph
    gi = graph_index_for_repo(nodes, edges, f"fixtures/{fixture}")
    failures, items = verify_fixture(fixture, lang, gi)
    score = 1 - len(failures) / max(items, 1)
    msg = "\n".join(failures[:60])
    assert score >= 0.95, f"P/R {score:.3f} ({len(failures)}/{items} failed)\n{msg}"
