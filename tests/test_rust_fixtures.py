"""P/R verification of the Rust fixture against @ast annotations."""

from harness import graph_index_for_repo, verify_fixture


def test_rust_fixture(spark):
    from stakgraph_spark.pipeline import build_graph
    from stakgraph_spark.source import fixture_source_df

    src = fixture_source_df(spark, {"rust": "rust"})
    g = build_graph(spark, src)
    nodes = g.nodes.persist()
    edges = g.edges.persist()
    gi = graph_index_for_repo(nodes, edges, "fixtures/rust")
    failures, items = verify_fixture("rust", "rust", gi)
    score = 1 - len(failures) / max(items, 1)
    msg = "\n".join(failures[:60])
    assert score >= 0.95, f"P/R {score:.3f} ({len(failures)}/{items} failed)\n{msg}"
