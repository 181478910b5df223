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


FIELDS = """\
export class PersonService {
  query(sql: string): string { return sql; }
  find(id: number): number { return id; }
}

export class AuditLog {
  find(id: number): number { return id + 1; }
}
"""

CONTROLLER = """\
import { PersonService, AuditLog } from './service';

export class Controller {
  private service: PersonService;
  audit = new AuditLog();

  constructor(private db: PersonService) {}

  handle(): void {
    this.service.query('select 1');
    this.audit.find(2);
    this.db.find(3);
    this.helper();
  }

  helper(): void {}
}
"""


def test_class_field_receiver_types(spark):
    """`this.field.method()` resolves through the class-field registry at
    confidence 1.0 for all three field shapes: typed declaration, new-
    initializer, constructor parameter property (registry/typescript.rs
    class_fields, ts_resolver.rs:586-655); `this.method()` resolves as a
    same-class method via the operand strategy."""
    from stakgraph_spark.pipeline import build_graph
    from stakgraph_spark.schema import SOURCE_SCHEMA
    from pyspark.sql import functions as F

    rows = [
        {"repo": "r", "path": "src/service.ts", "commit": "c",
         "lang": "typescript", "content": FIELDS},
        {"repo": "r", "path": "src/controller.ts", "commit": "c",
         "lang": "typescript", "content": CONTROLLER},
    ]
    g = build_graph(spark, spark.createDataFrame(rows, SOURCE_SCHEMA))
    calls = (g.edges.where("edge_type = 'Calls'")
             .join(g.nodes.select(F.col("node_key").alias("src_key"),
                                  F.col("name").alias("caller")), "src_key")
             .join(g.nodes.select(F.col("node_key").alias("dst_key"),
                                  F.col("name").alias("callee"),
                                  F.element_at("meta", "operand")
                                  .alias("callee_cls")), "dst_key")
             .where("caller = 'handle'")
             .select("callee", "callee_cls", "strategy", "confidence")
             .collect())
    got = {(r["callee"], r["callee_cls"]): (r["strategy"], r["confidence"])
           for r in calls}
    # typed field — `find` is ambiguous (PersonService.find vs AuditLog.find),
    # only the field type can disambiguate
    assert got.get(("query", "PersonService")) == ("type_resolved", 1.0), got
    assert got.get(("find", "AuditLog")) == ("type_resolved", 1.0), got
    # constructor parameter property
    assert got.get(("find", "PersonService")) == ("type_resolved", 1.0), got
    # this.method() -> same-class operand resolution
    assert ("helper", "Controller") in got, got


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
