"""Graph read/query operators over materialized graph_nodes / graph_edges
(SURVEY.md §2E).

k_hop is the distributed traversal primitive: iterative frontier joins over
the edges DataFrame (each hop is one equi-join on src_key), bounded by
max_hops — the BackendTester's transitive endpoint->handler->DataModel check
(reference ast/src/testing/test_backend.rs:136-280) runs on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_hop(edges: DataFrame, seeds: DataFrame, edge_types: list[str],
          max_hops: int = 10) -> DataFrame:
    """All node keys reachable from `seeds` (single column `node_key`) via
    <= max_hops edges of the given types.  Each hop is a distributed
    frontier-to-edges join; the loop is driver-side but bounded and each
    iteration's data stays in DataFrames (no collect)."""
    e = (edges.where(F.col("edge_type").isin(edge_types))
         .select(F.col("src_key").alias("node_key"),
                 F.col("dst_key").alias("next_key")))
    visited = seeds.select("node_key").distinct().localCheckpoint()
    frontier = visited
    for _ in range(max_hops):
        nxt = (frontier.join(e, "node_key")
               .select(F.col("next_key").alias("node_key")).distinct()
               .join(visited, "node_key", "left_anti")
               .localCheckpoint())
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited


def find_resource_nodes(nodes: DataFrame, verb: str, path: str,
                        node_type: str = "Endpoint") -> DataFrame:
    """Endpoint/Request nodes whose name contains the normalized path and
    whose verb matches (find_resource_nodes, reference graph trait — the
    FrontendTester probes Request nodes, the BackendTester Endpoints)."""
    return (nodes.where(F.col("node_type") == node_type)
            .where(F.col("name").contains(path))
            .where(F.upper(F.element_at("meta", "verb")) == verb.upper()))


def coverage_stats(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Per-language test-coverage tiers (lang/graphs/coverage/*.rs):

      unit        targets = non-empty Functions, covered by
                  UnitTest -CALLS-> Function edges
      integration same targets, covered by IntegrationTest -CALLS-> Function
      e2e         targets = Endpoints, covered by E2eTest -CALLS-> Endpoint

    Returns (lang, tier, total_tests, total_targets, covered, pct).  The
    reference additionally subtracts Mock nodes from scope; its non-LSP
    builder never produces Mocks, so the term is identically zero here too."""
    calls = edges.where(F.col("edge_type") == "Calls")

    def tier(name, test_type, target_type, target_flt=None):
        targets = nodes.where(F.col("node_type") == target_type)
        if target_flt is not None:
            targets = targets.where(target_flt)
        tests = (nodes.where(F.col("node_type") == test_type)
                 .groupBy("lang").agg(F.count("*").alias("total_tests")))
        t_keys = targets.select("lang", "node_key")
        test_keys = nodes.where(F.col("node_type") == test_type) \
            .select(F.col("node_key").alias("src_key"))
        covered = (calls.join(test_keys, "src_key", "leftsemi")
                   .select(F.col("dst_key").alias("node_key")).distinct()
                   .join(t_keys, "node_key", "leftsemi"))
        tot = t_keys.groupBy("lang").agg(F.count("*").alias("total_targets"))
        cov = (t_keys.join(covered.select("node_key"), "node_key", "leftsemi")
               .groupBy("lang").agg(F.count("*").alias("covered")))
        return (tot.join(cov, "lang", "left").join(tests, "lang", "left")
                .select("lang", F.lit(name).alias("tier"),
                        F.coalesce("total_tests", F.lit(0)).alias("total_tests"),
                        "total_targets",
                        F.coalesce("covered", F.lit(0)).alias("covered"))
                .withColumn("pct", F.round(
                    F.col("covered") * 100.0
                    / F.greatest(F.col("total_targets"), F.lit(1)), 2)))

    nonempty = (F.length(F.coalesce("body", F.lit(""))) > 0) \
        if "body" in nodes.columns else F.lit(True)
    return (tier("unit", "UnitTest", "Function", nonempty)
            .unionByName(tier("integration", "IntegrationTest", "Function",
                              nonempty))
            .unionByName(tier("e2e", "E2eTest", "Endpoint")))


def handlers_for_endpoints(nodes: DataFrame, edges: DataFrame,
                           endpoints: DataFrame) -> DataFrame:
    """Function nodes reached by HANDLER edges from the given endpoints."""
    h = (edges.where(F.col("edge_type") == "Handler")
         .join(endpoints.select(F.col("node_key").alias("src_key")), "src_key",
               "leftsemi"))
    return nodes.join(h.select(F.col("dst_key").alias("node_key")),
                      "node_key", "leftsemi")


def functions_using_data_model(nodes: DataFrame, edges: DataFrame,
                               dm_name: str) -> DataFrame:
    """node keys of Functions with a CONTAINS edge to a DataModel whose name
    contains dm_name (check_direct_data_model_usage)."""
    dms = (nodes.where(F.col("node_type") == "DataModel")
           .where(F.lower(F.col("name")).contains(dm_name.lower()))
           .select(F.col("node_key").alias("dst_key")))
    c = (edges.where(F.col("edge_type") == "Contains")
         .join(dms, "dst_key", "leftsemi"))
    fns = nodes.where(F.col("node_type").isin("Function", "UnitTest",
                                              "IntegrationTest", "E2eTest"))
    return (fns.join(c.select(F.col("src_key").alias("node_key")),
                     "node_key", "leftsemi").select("node_key"))
