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
