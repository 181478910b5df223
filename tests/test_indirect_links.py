"""Indirect test linking (linker.rs:94-131) and e2e test-id linking
(linker.rs:242-300)."""

import pytest


def test_indirect_test_endpoint_meta(spark):
    """A synthetic python repo: integration test -> helper -> Request ->
    Endpoint; the endpoint must gain meta.indirect_test / meta.test_helper."""
    from pyspark.sql import functions as F

    from stakgraph_spark.pipeline import build_graph
    from stakgraph_spark.schema import SOURCE_SCHEMA

    app = '''from fastapi import FastAPI
app = FastAPI()

@app.get("/widgets")
def list_widgets():
    return []
'''
    helper = '''import requests

def fetch_widgets():
    return requests.get("/widgets")
'''
    test = '''from helpers import fetch_widgets

def test_widgets_via_helper():
    data = fetch_widgets()
    assert data is not None
'''
    rows = [
        {"repo": "synth/ind", "path": "app.py", "commit": "c1",
         "lang": "python", "content": app},
        {"repo": "synth/ind", "path": "helpers.py", "commit": "c1",
         "lang": "python", "content": helper},
        {"repo": "synth/ind", "path": "tests/integration/test_api.py",
         "commit": "c1", "lang": "python", "content": test},
    ]
    src = spark.createDataFrame(rows, SOURCE_SCHEMA)
    g = build_graph(spark, src)
    eps = (g.nodes.where("node_type='Endpoint'")
           .select("name", F.element_at("meta", "indirect_test").alias("it"),
                   F.element_at("meta", "test_helper").alias("th")).collect())
    byname = {r["name"]: r for r in eps}
    assert "/widgets" in byname
    assert byname["/widgets"]["it"] == "test_widgets_via_helper"
    assert byname["/widgets"]["th"] == "fetch_widgets"


def test_e2e_test_id_links_frontend_function(spark):
    """A synthetic react repo: an e2e spec's data-testid selector matches a
    component's JSX attribute -> E2eTest -CALLS-> Function edge.  (Neither
    the react nor the nextjs reference fixture declares component-side
    data-testid attributes, so the reference's own fixtures cannot exercise
    linker.rs:242-280 either — hence the synthetic repo.)"""
    from stakgraph_spark.pipeline import build_graph
    from stakgraph_spark.schema import SOURCE_SCHEMA

    component = """export function StatsPanel() {
  return (
    <div>
      <button data-testid="stats-toggle">Toggle</button>
    </div>
  );
}
"""
    e2e = """import { test, expect } from '@playwright/test';

test.describe('dashboard e2e', () => {
  test('toggles stats', async ({ page }) => {
    await page.click('[data-testid="stats-toggle"]');
  });
});
"""
    rows = [
        {"repo": "synth/fe", "path": "src/StatsPanel.tsx", "commit": "c1",
         "lang": "react", "content": component},
        {"repo": "synth/fe", "path": "src/e2e/dashboard.e2e.ts",
         "commit": "c1", "lang": "react", "content": e2e},
    ]
    src = spark.createDataFrame(rows, SOURCE_SCHEMA)
    g = build_graph(spark, src)
    e2e_keys = {r["node_key"] for r in
                g.nodes.where("node_type='E2eTest'")
                .select("node_key").collect()}
    fn_keys = {r["node_key"] for r in
               g.nodes.where("node_type='Function'")
               .select("node_key").collect()}
    links = [(r["src_key"], r["dst_key"]) for r in
             g.edges.where("edge_type='Calls'")
             .select("src_key", "dst_key").collect()
             if r["src_key"] in e2e_keys and r["dst_key"] in fn_keys]
    assert links, "no E2eTest->Function test-id links found"


def test_ruby_class_includes_imports_edge(spark):
    """`include Module` inside a class -> Class -IMPORTS-> module Class
    (class_includes, btreemap_graph.rs:603-624)."""
    from stakgraph_spark.pipeline import build_graph
    from stakgraph_spark.schema import SOURCE_SCHEMA

    mod = """class Trackable
  def track
    puts 'tracked'
  end
end
"""
    user = """class User
  include Trackable

  def name
    'u'
  end
end
"""
    rows = [
        {"repo": "synth/inc", "path": "app/models/trackable.rb",
         "commit": "c1", "lang": "ruby", "content": mod},
        {"repo": "synth/inc", "path": "app/models/user.rb",
         "commit": "c1", "lang": "ruby", "content": user},
    ]
    src = spark.createDataFrame(rows, SOURCE_SCHEMA)
    g = build_graph(spark, src)
    cls = {r["name"]: r["node_key"] for r in
           g.nodes.where("node_type='Class'").select("name", "node_key").collect()}
    imports = {(r["src_key"], r["dst_key"]) for r in
               g.edges.where("edge_type='Imports'")
               .select("src_key", "dst_key").collect()}
    assert (cls["User"], cls["Trackable"]) in imports
