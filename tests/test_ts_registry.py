"""TS registry chained-call resolution: `getClient().query()` resolves via
the receiver call's declared (Promise-unwrapped) return type
(registry/typescript.rs:110-127, ts_resolver.rs:459-519)."""

from pyspark.sql import functions as F

CLIENT = """\
export class ApiClient {
  query(sql: string): string {
    return sql;
  }
}

export class Db {
  query(sql: string): string {
    return sql + "!";
  }
}

export function getClient(): Promise<ApiClient> {
  return Promise.resolve(new ApiClient());
}
"""

MAIN = """\
import { getClient } from './client';

export function run(): void {
  const rows = getClient().query('select 1');
  return rows;
}
"""


def test_chained_call_return_type(spark):
    from stakgraph_spark.pipeline import build_graph
    from stakgraph_spark.schema import SOURCE_SCHEMA

    rows = [
        {"repo": "r", "path": "src/client.ts", "commit": "c",
         "lang": "typescript", "content": CLIENT},
        {"repo": "r", "path": "app/main.ts", "commit": "c",
         "lang": "typescript", "content": MAIN},
    ]
    g = build_graph(spark, spark.createDataFrame(rows, SOURCE_SCHEMA))
    # `query` is ambiguous globally (ApiClient.query vs Db.query) — only the
    # fn_returns registry can pick ApiClient.query, at confidence 1.0
    calls = (g.edges.where("edge_type = 'Calls'")
             .join(g.nodes.select(F.col("node_key").alias("src_key"),
                                  F.col("name").alias("caller")), "src_key")
             .join(g.nodes.select(F.col("node_key").alias("dst_key"),
                                  F.col("name").alias("callee"),
                                  F.col("file").alias("callee_file"),
                                  F.element_at("meta", "operand")
                                  .alias("callee_cls")), "dst_key")
             .where("caller = 'run' AND callee = 'query'"))
    got = [(r["callee_cls"], r["strategy"], r["confidence"])
           for r in calls.collect()]
    assert got, "run -> query edge missing"
    assert all(cls == "ApiClient" for cls, _, _ in got), got
    assert all(s == "type_resolved" and c == 1.0 for _, s, c in got), got
