"""prune_graph `full=` contract (round-7 optimization).

The final payload materialization may filter a SUPERSET table (the plain
node checkpoint, before the instance-filter / endpoint-drop anti-joins)
by the pruned key set, because `keys` is derived from the filtered view
and therefore already excludes every dropped row.  This pins that the
`full=` path returns exactly the same nodes and edges as the legacy path,
across all three drop mechanisms (orphan prune, DataModel-vs-Class dedup,
dangling-edge removal)."""

from pyspark.sql import functions as F


def _mk_nodes(spark, rows):
    return spark.createDataFrame(
        rows,
        "key_h long, node_key string, node_type string, repo string, "
        "lang string, name string, file string, start long, end long, "
        "meta map<string,string>, body string")


def _mk_edges(spark, rows):
    return spark.createDataFrame(
        rows,
        "src_h long, dst_h long, edge_type string, operand string, "
        "confidence double, strategy string, repo string, lang string")


def test_prune_full_superset_equivalence(spark):
    from stakgraph_spark.prune import prune_graph

    r, l = "repo", "python"
    filtered = [
        # survives: ordinary function with a Calls edge
        (1, "k1", "Function", r, l, "f_keep", "a.py", 1, 5, {}, "b1"),
        # survives: nesting parent
        (2, "k2", "Function", r, l, "f2", "a.py", 10, 30, {}, "b2"),
        # orphan-pruned: nested in f2, no protecting edges
        (3, "k3", "Function", r, l, "f_orphan", "a.py", 12, 14, {}, "b3"),
        # survives: Class with Operand evidence
        (4, "k4", "Class", r, l, "X", "m.py", 1, 9, {}, "b4"),
        # dedup-dropped: DataModel shadowed by the Operand-bearing Class
        (5, "k5", "DataModel", r, l, "X", "m.py", 1, 9, {}, "b5"),
    ]
    # the superset additionally carries a row the pipeline's upstream
    # anti-joins removed (e.g. a java instance-filter hit) — it is absent
    # from the filtered view, hence from slim, hence from keys, and must
    # not resurface through the full= path
    superset = filtered + [
        (6, "k6", "Instance", r, l, "ghost", "m.py", 3, 3, {}, "b6"),
    ]
    edges = [
        (3, 2, "NestedIn", None, None, None, r, l),   # orphan marker
        (4, 1, "Operand", None, None, None, r, l),    # keeper evidence
        (1, 2, "Calls", None, 0.9, "same_file", r, l),
        (2, 3, "Contains", None, None, None, r, l),   # dangles after prune
    ]

    nodes_f = _mk_nodes(spark, filtered)
    nodes_s = _mk_nodes(spark, superset)
    edges_df = _mk_edges(spark, edges)

    legacy_n, legacy_e = prune_graph(nodes_f, edges_df)
    new_n, new_e = prune_graph(nodes_f, edges_df, full=nodes_s)

    legacy_nodes = sorted(map(tuple, legacy_n.collect()))
    new_nodes = sorted(map(tuple, new_n.collect()))
    assert legacy_nodes == new_nodes
    assert sorted(r["node_key"] for r in new_n.collect()) == ["k1", "k2", "k4"]

    legacy_edges = sorted(map(tuple, legacy_e.collect()))
    new_edges = sorted(map(tuple, new_e.collect()))
    assert legacy_edges == new_edges
    kept = {(r["src_key"], r["dst_key"], r["edge_type"])
            for r in new_e.collect()}
    assert kept == {("k4", "k1", "Operand"), ("k1", "k2", "Calls")}
