"""Resumable pipeline runner — per-partition checkpoints, lineage + metrics.

Mirrors the reference's stage-wise streaming flush + commit-hash bookkeeping
(ast/src/builder/streaming.rs:96-130, ast/src/lang/graphs/graph_ops.rs:95-274)
with Spark-native building blocks (FIXTURES.md §4):

* the extraction plane's RAW stream is persisted to parquet partitioned by
  (repo, lang); a `pipeline_manifest` JSONL records one row per finished
  partition, so a restarted run re-extracts ONLY partitions without a
  `done` manifest row (the expensive per-file parse is never repeated)
* `stage_metrics` JSONL records per-stage wall time plus node- and
  edge-type counts (the per-stage triple-count metrics of the north rule)
* graph_nodes / graph_edges are written partitioned by (repo, lang); on a
  real cluster these writes become Iceberg `MERGE INTO` commits — the layout
  and keys are already MERGE-shaped (node_key / (src_key, dst_key, edge_type))
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class PipelineRunner:
    def __init__(self, spark: SparkSession, workdir: str, run_id: str | None = None):
        self.spark = spark
        self.workdir = workdir
        self.run_id = run_id or uuid.uuid4().hex[:12]
        os.makedirs(workdir, exist_ok=True)
        self.manifest_path = os.path.join(workdir, "pipeline_manifest.jsonl")
        self.metrics_path = os.path.join(workdir, "stage_metrics.jsonl")
        self.raw_path = os.path.join(workdir, "raw")

    # ---------------- manifest ----------------
    def _manifest_rows(self) -> list[dict]:
        if not os.path.exists(self.manifest_path):
            return []
        with open(self.manifest_path) as f:
            return [json.loads(x) for x in f if x.strip()]

    def done_partitions(self, stage: str) -> set[tuple[str, str]]:
        return {(r["repo"], r["lang"]) for r in self._manifest_rows()
                if r["stage"] == stage and r["status"] == "done"}

    def _mark(self, stage: str, parts: list[tuple[str, str]], rows_out: int,
              started: float):
        with open(self.manifest_path, "a") as f:
            for repo, lang in parts:
                f.write(json.dumps({
                    "run_id": self.run_id, "stage": stage, "repo": repo,
                    "lang": lang, "status": "done", "rows_out": rows_out,
                    "started_at": round(started, 3),
                    "finished_at": round(time.time(), 3)}) + "\n")

    def _metric(self, stage: str, duration_ms: float, extra: dict):
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps({"run_id": self.run_id, "stage": stage,
                                "duration_ms": round(duration_ms, 1),
                                **extra}) + "\n")

    # ---------------- stages ----------------
    def run(self, source: DataFrame) -> dict:
        from .extract import extract_raw
        from .pipeline import build_graph
        from .source import with_skip_flags

        t_all = time.time()
        parts = [(r.repo, r.lang) for r in
                 source.select("repo", "lang").distinct().collect()]
        done = self.done_partitions("extract")
        todo = [p for p in parts if p not in done]

        # ---- stage: extract (per-partition checkpointed) ----
        t0 = time.time()
        if todo:
            cond = F.concat_ws("\t", "repo", "lang").isin(
                ["\t".join(p) for p in todo])
            src_todo = with_skip_flags(source.where(cond)) \
                .repartition("repo", "lang")
            raw_new = extract_raw(src_todo.where(F.col("skipped").isNull()))
            (raw_new.write.mode("append").partitionBy("repo", "lang")
             .parquet(self.raw_path))
            self._mark("extract", todo, -1, t0)
        raw = self.spark.read.parquet(self.raw_path) if os.path.exists(
            os.path.join(self.raw_path)) else None
        self._metric("extract", (time.time() - t0) * 1000,
                     {"partitions_total": len(parts),
                      "partitions_skipped": len(done),
                      "partitions_extracted": len(todo)})

        # ---- stage: link + prune (global joins; deterministic from raw) ----
        t0 = time.time()
        # keep only raw rows for partitions present in this source
        keys = ["\t".join(p) for p in parts]
        raw = raw.where(F.concat_ws("\t", "repo", "lang").isin(keys))
        g = build_graph(self.spark, source, raw=raw.localCheckpoint())
        nodes_path = os.path.join(self.workdir, "graph_nodes")
        edges_path = os.path.join(self.workdir, "graph_edges")
        (g.nodes.write.mode("overwrite").partitionBy("repo", "lang")
         .parquet(nodes_path))
        (g.edges.write.mode("overwrite").partitionBy("repo", "lang")
         .parquet(edges_path))

        nodes = self.spark.read.parquet(nodes_path)
        edges = self.spark.read.parquet(edges_path)
        node_counts = {r["node_type"]: r["count"] for r in
                       nodes.groupBy("node_type").count().collect()}
        edge_counts = {r["edge_type"]: r["count"] for r in
                       edges.groupBy("edge_type").count().collect()}
        self._metric("link_materialize", (time.time() - t0) * 1000,
                     {"node_counts": node_counts, "edge_counts": edge_counts,
                      "stage_timings": g.metrics})

        n_files = source.count()
        total = time.time() - t_all
        self._metric("total", total * 1000,
                     {"files": n_files,
                      "files_sec": round(n_files / max(total, 1e-9), 2)})
        return {"run_id": self.run_id, "nodes_path": nodes_path,
                "edges_path": edges_path,
                "node_counts": node_counts, "edge_counts": edge_counts,
                "extracted_partitions": len(todo),
                "skipped_partitions": len(done)}
