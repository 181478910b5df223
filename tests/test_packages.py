"""Workspace/package detection -> Package nodes (workspace/mod.rs:94-200,
repo.rs:213-265) on the reference monorepo fixtures."""

import pytest


@pytest.fixture(scope="module")
def mono_graph(spark):
    from stakgraph_spark.pipeline import build_graph
    from stakgraph_spark.schema import SOURCE_SCHEMA
    from stakgraph_spark.source import walk_fixture

    rows = []
    # multi-language monorepo: walk once per language into the SAME repo
    for lang in ("python", "rust"):
        rows += walk_fixture("monorepo/monorepo_python_rust", lang,
                             repo="fixtures/monorepo_python_rust")
    for lang in ("rust",):
        rows += walk_fixture("monorepo/monorepo_rust", lang,
                             repo="fixtures/monorepo_rust")
    # single-package repo: must NOT enter workspace mode
    rows += walk_fixture("python/web", "python")
    # de-dup rows walked by both language specs (e.g. pkg files)
    seen, uniq = set(), []
    for r in rows:
        k = (r["repo"], r["path"])
        if k not in seen:
            seen.add(k)
            uniq.append(r)
    src = spark.createDataFrame(uniq, SOURCE_SCHEMA)
    from stakgraph_spark.pipeline import build_graph
    g = build_graph(spark, src)
    nodes = g.nodes.persist()
    edges = g.edges.persist()
    nodes.count(), edges.count()
    return nodes, edges


def _pkgs(nodes, repo):
    from pyspark.sql import functions as F
    return {r["name"]: r for r in
            nodes.where((nodes.node_type == "Package") & (nodes.repo == repo))
            .select("name", "file",
                    F.element_at("meta", "language").alias("language"),
                    F.element_at("meta", "framework").alias("framework"))
            .collect()}


def test_python_rust_monorepo_packages(mono_graph):
    nodes, edges = mono_graph
    pkgs = _pkgs(nodes, "fixtures/monorepo_python_rust")
    # children: libs/common (setup.py), services/web (requirements.txt),
    # services/processor (Cargo.toml [package]); the root pyproject.toml is
    # python — already covered by a child package, so the root is excluded
    assert set(pkgs) == {"common", "web", "processor"}, set(pkgs)
    assert pkgs["processor"]["language"] == "rust"
    assert pkgs["web"]["language"] == "python"


def test_rust_workspace_packages(mono_graph):
    nodes, edges = mono_graph
    pkgs = _pkgs(nodes, "fixtures/monorepo_rust")
    # root Cargo.toml is [workspace]-only -> not a package; members are
    assert "api" in pkgs and "shared" in pkgs
    assert all(p["language"] == "rust" for p in pkgs.values())


def test_single_package_repo_has_no_package_nodes(mono_graph):
    nodes, _ = mono_graph
    assert not _pkgs(nodes, "fixtures/python/web")


def test_package_edges(mono_graph):
    nodes, edges = mono_graph
    pkg_keys = {r["node_key"] for r in
                nodes.where(nodes.node_type == "Package")
                .select("node_key").collect()}
    repo_keys = {r["node_key"] for r in
                 nodes.where(nodes.node_type == "Repository")
                 .select("node_key").collect()}
    contains = {(r["src_key"], r["dst_key"]) for r in
                edges.where(edges.edge_type == "Contains")
                .select("src_key", "dst_key").collect()}
    covered = {d for (s, d) in contains if d in pkg_keys and s in repo_keys}
    assert covered == pkg_keys, "every Package hangs off its Repository"
