"""Adversarial inputs for the hand-rolled scanners (VERDICT r01 item 2).

py-tree-sitter is not installable in this container (no network, no wheels
baked in — see COVERAGE.md §parser note), so the extractors are mask+scan
line scanners.  These cases are the classic scanner-breakers: string
literals containing braces/keywords, comments containing code, nested
generics, rust macros, multi-line constructs.  Pure-python tests (no Spark).
"""

from stakgraph_spark.extract.go_lang import extract_go
from stakgraph_spark.extract.java_lang import extract_java
from stakgraph_spark.extract.python_lang import extract_python
from stakgraph_spark.extract.ruby_lang import extract_ruby
from stakgraph_spark.extract.rust_lang import extract_rust


def _names(ex, t):
    return [n.name for n in ex.nodes if n.node_type == t]


def test_go_strings_with_braces_and_fake_funcs():
    src = '''package main

func Real() string {
\ts := "func Fake() { nested { braces } }"
\tt := `raw } { func AlsoFake() {`
\t// func CommentFake() {
\treturn s + t
}

func Second() {}
'''
    ex = extract_go("a/main.go", src)
    fns = _names(ex, "Function")
    assert fns == ["Real", "Second"], fns


def test_go_brace_in_string_does_not_break_spans():
    src = '''package main

func A() {
\tx := "}"
\ty := "{"
\t_ = x + y
}

func B() {}
'''
    ex = extract_go("a/s.go", src)
    spans = {n.name: (n.start, n.end) for n in ex.nodes
             if n.node_type == "Function"}
    assert spans["A"] == (2, 6), spans
    assert spans["B"][0] == 8


def test_rust_nested_generics_and_macros():
    src = '''pub struct Holder<T: Into<Vec<HashMap<String, Box<dyn Fn() -> u8>>>>> {
    inner: T,
}

macro_rules! fake_fn {
    () => { fn not_a_real_fn() {} };
}

pub fn real_fn(x: Result<Option<Vec<u8>>, String>) -> bool {
    let s = "fn string_fn() {}";
    println!("{}", s);
    true
}
'''
    ex = extract_rust("src/adv.rs", src)
    fns = _names(ex, "Function")
    assert "real_fn" in fns
    assert "string_fn" not in fns
    assert "Holder" in _names(ex, "DataModel") + _names(ex, "Class")


def test_python_strings_and_nested_defs():
    src = '''def outer():
    s = "def fake(): pass"
    t = \'\'\'
def also_fake():
    pass
\'\'\'
    def inner():
        return s + t
    return inner

class C:
    def method(self):
        return "class Fake:"
'''
    ex = extract_python("adv.py", src)
    fns = set(_names(ex, "Function"))
    assert {"outer", "inner", "method"} <= fns
    assert "fake" not in fns and "also_fake" not in fns
    assert _names(ex, "Class") == ["C"]


def test_java_strings_annotations_generics():
    src = '''package adv;

public class Adv {
    private Map<String, List<Map<Integer, String>>> deep = new HashMap<>();

    public String tricky() {
        String s = "public void fake() { }";
        String t = "} } {";
        return s + t;
    }

    @SuppressWarnings("unchecked")
    public <T extends Comparable<T>> T generic(T x) { return x; }
}
'''
    ex = extract_java("src/main/java/Adv.java", src)
    fns = _names(ex, "Function")
    assert "tricky" in fns and "generic" in fns
    assert "fake" not in fns
    assert _names(ex, "Class") == ["Adv"]


def test_ruby_strings_interpolation_and_blocks():
    src = '''class Thing
  def real
    s = "def fake; end"
    t = "#{s} end end"
    items.each do |i|
      puts i
    end
    s + t
  end
end
'''
    ex = extract_ruby("app/models/thing.rb", src)
    fns = _names(ex, "Function")
    assert fns == ["real"], fns
    assert _names(ex, "Class") == ["Thing"]
    spans = {n.name: n.end for n in ex.nodes if n.node_type == "Class"}
    assert spans["Thing"] == 9  # the class closes at the real outer end


def test_ruby_comment_with_code_ignored():
    src = '''# def commented_out
# class AlsoCommented
CONST_X = 1
'''
    ex = extract_ruby("lib/x.rb", src)
    assert _names(ex, "Function") == []
    assert _names(ex, "Class") == []
    assert _names(ex, "Var") == ["CONST_X"]


def test_kotlin_allman_brace_class_span():
    """Allman-style: the body '{' sits alone under a balanced-paren header —
    the span must include the body, and methods inside must keep their
    enclosing-class attribution (ADVICE r03, kotlin_lang._span_end)."""
    from stakgraph_spark.extract.kotlin_lang import extract_kotlin
    src = '''package demo

class Person(val name: String)
{
    fun greet(): String
    {
        return "hi " + name
    }
}

data class Point(val x: Int, val y: Int)
'''
    ex = extract_kotlin("a/Person.kt", src)
    cls = [n for n in ex.nodes if n.node_type == "Class" and n.name == "Person"]
    assert cls and cls[0].end > cls[0].start + 1, "Allman body lost"
    fns = [n for n in ex.nodes if n.node_type == "Function" and n.name == "greet"]
    assert fns and fns[0].meta.get("operand") == "Person", fns
    # bodyless data class still ends at its header
    pt = [n for n in ex.nodes if n.node_type == "Class" and n.name == "Point"]
    assert pt and pt[0].end == pt[0].start


def test_ts_single_line_methods_with_semicolons():
    """One-line method bodies containing ';' must still be Function nodes
    (the _METHOD_ONELINE_RE path) and register their class fields."""
    from stakgraph_spark.extract.ts_lang import extract_ts
    src = '''export class Svc {
  private log: Logger;
  query(sql: string): string { return sql; }
  count(): number { let n = 1; return n; }
}
'''
    ex = extract_ts("src/svc.ts", src)
    fns = {n.name for n in ex.nodes if n.node_type == "Function"}
    assert {"query", "count"} <= fns, fns
    sf = [(m.src[1], m.target, m.extra.get("ftype")) for m in ex.mentions
          if m.kind == "struct_field"]
    assert ("Svc", "log", "Logger") in sf, sf


def test_svelte_edge_cases():
    """No-script components, script attributes, and unterminated script
    tags must not crash or emit junk nodes."""
    from stakgraph_spark.extract.svelte_lang import extract_svelte
    # no script at all
    ex = extract_svelte("src/routes/+page.svelte", "<main><h1>hi</h1></main>")
    assert ex.nodes == [] or all(n.node_type != "Function" for n in ex.nodes)
    # script with attributes + ts lang
    src = '''<script lang="ts" context="module">
  function load(): number { return 1; }
</script>
<p>{load()}</p>
'''
    ex = extract_svelte("src/lib/W.svelte", src)
    # "W" is the file's implicit default-exported component (RENDERS target)
    assert {n.name for n in ex.nodes
            if n.node_type == "Function"} == {"load", "W"}
    # unterminated script tag
    ex = extract_svelte("src/lib/Bad.svelte", "<script>\nfunction f() {")
    assert all(n.node_type != "Endpoint" for n in ex.nodes)


def test_ts_array_field_then_method():
    """Semicolon-free multi-line ARRAY class field: the skip must end at the
    array's own `]` (bracket-balanced), not run to the next brace-balanced
    line and swallow the following method (ADVICE r05 — _span_end only
    balances {})."""
    from stakgraph_spark.extract.ts_lang import extract_ts
    src = '''export class Grid {
  rows = [
    1,
    2,
    3
  ]

  paint(): string { return "ok" }
}
'''
    ex = extract_ts("src/grid.ts", src)
    fns = {n.name for n in ex.nodes if n.node_type == "Function"}
    assert "paint" in fns, fns
    # array items must not leak into the receiver registry
    sf = [m.target for m in ex.mentions if m.kind == "struct_field"]
    assert sf == [], sf


def test_ts_array_field_of_objects_then_method():
    """Array initializer whose elements are object literals (mixed [] and {}
    nesting) — the bracket balancer must treat both, and the object keys
    inside must not become struct_field registry entries."""
    from stakgraph_spark.extract.ts_lang import extract_ts
    src = '''export class Routes {
  table = [
    { path: Home, exact: true },
    { path: About,
      exact: false },
  ]

  match(url: string): string { return url }
}
'''
    ex = extract_ts("src/routes.ts", src)
    fns = {n.name for n in ex.nodes if n.node_type == "Function"}
    assert "match" in fns, fns
    sf = [m.target for m in ex.mentions if m.kind == "struct_field"]
    assert "path" not in sf and "exact" not in sf, sf


def test_ts_object_field_nested_braces_then_method():
    """Object-literal field initializer with NESTED braces, and a method on
    the line after it closes: _span_end must stop at the initializer's own
    closing brace so the method survives with the right span (VERDICT r05
    task 8 — pins _span_end's behavior for the ADVICE r04 skip)."""
    from stakgraph_spark.extract.ts_lang import extract_ts
    src = '''export class Cfg {
  defaults = {
    retry: { max: 3, backoff: { base: 100 } },
    hooks: {
      before: null,
    },
  };
  client: HttpClient;
  run(): number { return 1 }
}
'''
    ex = extract_ts("src/cfg.ts", src)
    fns = {n.name for n in ex.nodes if n.node_type == "Function"}
    assert "run" in fns, fns
    sf = [(m.target, m.extra.get("ftype")) for m in ex.mentions
          if m.kind == "struct_field"]
    # the real typed field right after the initializer must still register;
    # none of the nested object keys may
    assert ("client", "HttpClient") in sf, sf
    assert all(t not in ("retry", "hooks", "before", "max") for t, _ in sf), sf


def test_svelte_dollar_identifier_component_renders():
    """Imported component identifiers containing `$` (legal JS) must still
    produce the Page->component RENDERS mention — the tag probe regex must
    escape the identifier (ADVICE r05)."""
    from stakgraph_spark.extract.svelte_lang import extract_svelte
    src = '''<script>
  import C$Panel from "$lib/C$Panel.svelte";
</script>
<C$Panel title="x" />
'''
    ex = extract_svelte("src/routes/dash/+page.svelte", src)
    renders = [(m.src[1], m.target) for m in ex.mentions if m.kind == "renders"]
    assert ("/dash", "C$Panel") in renders, renders
