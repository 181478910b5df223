"""Resume-from-checkpoint: a restarted run must skip already-extracted
(repo, lang) partitions (pipeline_manifest) and produce the identical graph."""

import json
import shutil
import tempfile


def test_resume_skips_done_partitions(spark):
    from stakgraph_spark.runner import PipelineRunner
    from stakgraph_spark.source import fixture_source_df

    workdir = tempfile.mkdtemp(prefix="kg_resume_")
    try:
        full = fixture_source_df(spark, {"python/web": "python",
                                         "python/cli": "python"})

        # first run: only one repo's partition
        r1 = PipelineRunner(spark, workdir, run_id="run1")
        out1 = r1.run(full.where(full.repo == "fixtures/python/web"))
        assert out1["extracted_partitions"] == 1
        assert out1["skipped_partitions"] == 0

        # restart over the FULL source: python/web must be skipped
        r2 = PipelineRunner(spark, workdir, run_id="run2")
        out2 = r2.run(full)
        assert out2["skipped_partitions"] == 1
        assert out2["extracted_partitions"] == 1  # only python/cli

        # the resumed graph equals a from-scratch build
        from stakgraph_spark.pipeline import build_graph
        g = build_graph(spark, full)
        fresh_nodes = {r.node_key for r in g.nodes.select("node_key").collect()}
        resumed_nodes = {r.node_key for r in
                         spark.read.parquet(out2["nodes_path"])
                         .select("node_key").collect()}
        assert fresh_nodes == resumed_nodes

        # manifest + metrics artifacts exist with per-stage lineage
        manifest = [json.loads(x) for x in open(f"{workdir}/pipeline_manifest.jsonl")]
        assert {(m["repo"], m["status"]) for m in manifest} == {
            ("fixtures/python/web", "done"), ("fixtures/python/cli", "done")}
        metrics = [json.loads(x) for x in open(f"{workdir}/stage_metrics.jsonl")]
        link_stages = [m for m in metrics if m["stage"] == "link_materialize"]
        assert link_stages and "node_counts" in link_stages[-1]
        assert "edge_counts" in link_stages[-1]
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
