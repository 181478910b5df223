"""P/R verification of the svelte fixture — CURATED annotation set.

The reference's own svelte fixture annotations encode its extractor's
byte-offset bugs (`Function "unction fet"`, `DataModel "<script>"`,
`Class ""` — see testing/svelte/src/routes/+page.svelte:2-9), so matching
them would reproduce buffer bugs, not semantics (VERDICT r03).  This file
carries a hand-curated annotation set expressing the SANE output for the
same fixture tree; deviations from the reference's literal output are
listed in stakgraph_spark/extract/svelte_lang.py's module docstring and
locked in below as `absent:` precision items.
"""

import pytest

from harness import GraphIndex, graph_index_for_repo, parse_annotations

# suffix (unique within the fixture) -> curated @ast annotations
ANNOTATIONS = {
    "routes/+page.svelte": """
// @ast node: Page "/"
// @ast node: Function "fetchPeople"
// @ast edge: Calls -> Request "/api/people" "+page.svelte" [verb=GET]
// @ast node: Function "addPerson"
// @ast edge: Calls -> Request "/api/people" "+page.svelte" [verb=POST]
// @ast edge: Calls -> Function "fetchPeople" "+page.svelte"
// @ast node: Request "/api/people" [verb=GET]
// @ast edge: Calls -> Endpoint "/api/people" "+server.js" [verb=GET]
// @ast node: Request "/api/people" [verb=POST]
// @ast edge: Calls -> Endpoint "/api/people" "+server.js" [verb=POST]
// @ast absent: Class "" "+page.svelte"
// @ast absent: DataModel "<script>" "+page.svelte"
// @ast absent: DataModel "<main>" "+page.svelte"
// @ast absent: Function "unction fet" "+page.svelte"
""",
    "api/people/+server.js": """
// @ast node: Endpoint "/api/people" [verb=GET]
// @ast edge: Handler -> Function "GET" "+server.js"
// @ast node: Endpoint "/api/people" [verb=POST]
// @ast edge: Handler -> Function "POST" "+server.js"
// @ast node: Function "GET"
// @ast node: Function "POST"
// @ast edge: Calls -> Function "validate" "lib/Person.js"
// @ast edge: Calls -> Class "Person" "lib/Person.js"
""",
    "lib/Person.js": """
// @ast node: Class "Person"
// @ast edge: Operand -> Function "constructor" "lib/Person.js"
// @ast edge: Operand -> Function "validate" "lib/Person.js"
// @ast node: Function "constructor"
// @ast node: Function "validate"
""",
    "tests/test_person.js": """
// @ast node: UnitTest "testPersonCreation"
// @ast edge: Calls -> Class "Person" "lib/Person.js"
// @ast node: UnitTest "testPersonValidateAccepts"
// @ast edge: Calls -> Function "validate" "lib/Person.js"
// @ast node: UnitTest "testPersonValidateRejectsEmpty"
// @ast edge: Calls -> Function "validate" "lib/Person.js"
// @ast node: UnitTest "testPersonValidateRejectsShort"
// @ast edge: Calls -> Function "validate" "lib/Person.js"
// @ast absent: Function "unction testPerson" "test_person.js"
""",
    "tests/test_person.svelte": """
// @ast node: UnitTest "test_person_creation"
// @ast edge: Calls -> Class "Person" "lib/Person.js"
// @ast node: UnitTest "test_person_validate_accepts"
// @ast edge: Calls -> Function "validate" "lib/Person.js"
// @ast node: UnitTest "test_person_validate_rejects_empty"
// @ast edge: Calls -> Function "validate" "lib/Person.js"
// @ast node: UnitTest "test_person_validate_rejects_short"
// @ast edge: Calls -> Function "validate" "lib/Person.js"
// @ast absent: Function "  const test_person_" "test_person.svelte"
""",
    # synthetic supplement (not in the reference tree): a component-importing
    # page, exercising Page -RENDERS-> default-exported component (the React
    # path's stages.rs:339-461 analogue; VERDICT r04 #6)
    "routes/people/+page.svelte": """
// @ast node: Page "/people"
// @ast edge: Renders -> Function "PersonCard" "lib/PersonCard.svelte"
""",
    "lib/PersonCard.svelte": """
// @ast node: Function "PersonCard"
""",
    "tests/integration_api.svelte": """
// @ast node: IntegrationTest "test_get_people_endpoint" [test_kind=integration]
// @ast edge: Calls -> Endpoint "/api/people" "+server.js" [verb=GET]
// @ast edge: Calls -> Request "http://localhost:5173/api/people" "integration_api.svelte" [verb=GET]
// @ast node: IntegrationTest "test_post_people_validates" [test_kind=integration]
// @ast edge: Calls -> Endpoint "/api/people" "+server.js" [verb=POST]
// @ast node: IntegrationTest "test_post_people_rejects_invalid" [test_kind=integration]
// @ast edge: Calls -> Endpoint "/api/people" "+server.js" [verb=POST]
// @ast node: Request "http://localhost:5173/api/people" [verb=GET]
// @ast node: Request "http://localhost:5173/api/people" [verb=POST]
// @ast node: Request "http://localhost:5173/api/people" [verb=POST]
""",
}


# synthetic component + page rows backing the RENDERS annotations above
_EXTRA_ROWS = [
    {"repo": "fixtures/svelte",
     "path": "src/testing/svelte/src/lib/PersonCard.svelte",
     "commit": "fixture", "lang": "svelte",
     "content": "<script>\n  export let person;\n</script>\n\n"
                "<div class=\"card\">{person.name}</div>\n"},
    {"repo": "fixtures/svelte",
     "path": "src/testing/svelte/src/routes/people/+page.svelte",
     "commit": "fixture", "lang": "svelte",
     "content": "<script>\n  import PersonCard from"
                " '$lib/PersonCard.svelte';\n  export let data;\n</script>\n\n"
                "{#each data.people as person}\n"
                "  <PersonCard person={person} />\n{/each}\n"},
]


@pytest.fixture(scope="module")
def svelte_graph(spark):
    from stakgraph_spark.pipeline import build_graph
    from stakgraph_spark.schema import SOURCE_SCHEMA
    from stakgraph_spark.source import fixture_source_rows

    rows = fixture_source_rows({"svelte": "svelte"}) + _EXTRA_ROWS
    src = spark.createDataFrame(rows, SOURCE_SCHEMA)
    g = build_graph(spark, src)
    nodes = g.nodes.persist()
    edges = g.edges.persist()
    nodes.count(), edges.count()
    return nodes, edges


def _verify(gi: GraphIndex):
    """verify_fixture semantics over the curated annotation dict."""
    failures, items, counts = [], 0, {}
    for suffix, text in ANNOTATIONS.items():
        groups, absents = parse_annotations(text, "// @ast ")
        for g in groups:
            counts[g.node_type] = counts.get(g.node_type, 0) + 1
        for a in absents:
            items += 1
            if gi.find(a.node_type, a.name, a.file_suffix):
                failures.append(f"absent-violated: {a.node_type}({a.name})")
        for g in groups:
            items += 1
            subjects = gi.find_all(g.node_type, g.name, suffix, g.meta or None)
            if not subjects:
                failures.append(f"node-missing: {g.node_type}({g.name}) in {suffix}")
                items += len(g.edges)
                continue
            for e in g.edges:
                items += 1
                others = gi.find_all(e.other_type, e.other_name, e.other_file,
                                     e.other_meta or None)
                ok = others and any(
                    gi.has_edge(*((o, s) if e.direction == "<-" else (s, o)),
                                e.edge_type)
                    for s in subjects for o in others)
                if not ok:
                    failures.append(
                        f"edge-missing: {e.edge_type} {g.name} {e.direction} "
                        f"{e.other_name}")
    for node_type, expected in sorted(counts.items()):
        items += 1
        actual = gi.count(node_type)
        if actual != expected:
            failures.append(f"count: {node_type} expected {expected} got {actual}")
    return failures, items


def test_svelte_fixture(svelte_graph):
    nodes, edges = svelte_graph
    gi = graph_index_for_repo(nodes, edges, "fixtures/svelte")
    failures, items = _verify(gi)
    score = 1 - len(failures) / max(items, 1)
    msg = "\n".join(failures[:40])
    assert score >= 0.95, f"P/R {score:.3f} ({len(failures)}/{items} failed)\n{msg}"
